"""Placeholder — populated in a later milestone."""

QUERIES: list = []
