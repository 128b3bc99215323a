"""Property-based tests (hypothesis) for the determinism-critical paths.

These pin the invariants everything else rests on:
- the fixed-point aggregation recipe is partition-order independent and
  equals an exact decimal reference;
- the parse contract routes arbitrary JSON-ish inputs consistently with
  a Python-json reference model of the lenient-Jackson semantics.
"""

from __future__ import annotations

import json
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


def _fixed_point_sum(values: list[float]) -> float:
    # mirror of functions/numeric.dsum in pure python
    total = sum(int(math.floor(v * 1_000_000.0 + 0.5)) for v in values)
    return total / 1_000_000.0


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_fixed_point_sum_exact_and_order_independent(decs):
    values = [float(d) for d in decs]
    expected = float(
        sum(d.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP) for d in decs)
    )
    got = _fixed_point_sum(values)
    assert got == expected
    # order independence: reversed and sorted partitions give identical bits
    assert _fixed_point_sum(list(reversed(values))) == got
    assert _fixed_point_sum(sorted(values)) == got


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            # valid InputEvent-shaped objects
            st.fixed_dictionaries(
                {},
                optional={
                    "id": st.text(
                        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
                        max_size=8,
                    ),
                    "type": st.sampled_from(["login", "view", ""]),
                    "timestamp": st.integers(min_value=0, max_value=2**40),
                },
            ).map(json.dumps),
            # malformed inputs
            st.sampled_from(
                ["{broken", "garbage", "[1,2]", '"str"',
                 '{"timestamp": "NaN-text"}', ""]
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_parse_route_matches_reference_model(spark, messages):
    """Route decision must match the lenient-Jackson model: JSON objects
    (with int-or-missing timestamp) are valid; everything else errors."""
    from flink_tank_spark.operators.parse import parse_and_route
    from pyspark.sql import functions as F

    def model_is_valid(m: str) -> bool:
        try:
            obj = json.loads(m)
        except json.JSONDecodeError:
            return False
        if not isinstance(obj, dict):
            return False
        ts = obj.get("timestamp", 0)
        return isinstance(ts, int) and not isinstance(ts, bool)

    df = spark.createDataFrame([(i, m) for i, m in enumerate(messages)], ["arrival", "value"])
    valid, errors = parse_and_route(df, now=F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    n_valid, n_err = valid.count(), errors.count()
    expected_valid = sum(model_is_valid(m) for m in messages)
    assert n_valid == expected_valid
    assert n_err == len(messages) - expected_valid


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    k=st.integers(min_value=1, max_value=9),
)
def test_distributed_ntile_property(n, k):
    """distributed_ntile == ANSI NTILE for arbitrary (n, k), including
    n < k, n % k != 0, and duplicate sort values (tiebreak column)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from flink_tank_spark.operators.rank import distributed_ntile
    from flink_tank_spark.session import get_spark

    spark = get_spark("prop-ntile", cpus=8)
    df = spark.range(n).select(
        (F.col("id") * 37 % 11).alias("v"),  # heavy duplicates in v
        F.col("id").alias("tid"),
    )
    got = {r.tid: r.nt for r in distributed_ntile(df, ["v", "tid"], k, out_col="nt").collect()}
    want = {
        r.tid: r.nt
        for r in df.withColumn("nt", F.ntile(k).over(W.orderBy("v", "tid"))).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """The fixpoint label propagation must equal a reference union-find
    (min-root union ⇒ every component's root is its min id) on arbitrary
    random graphs — chains, duplicate edges, multiple components."""
    from flink_tank_spark.operators import dedup

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.doc_id: r.canon_id for r in dedup.connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.decimals(min_value=Decimal("0.00"), max_value=Decimal("999.99"),
                    places=2, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    )
)
def test_histogram_quantiles_match_rank_reference(spark, vals):
    """For 2-decimal data the histogram quantile must equal the exact
    lower rank quantile (smallest v with rank >= ceil(q*N)) — the
    losslessness claim behind the sketch."""
    from flink_tank_spark.operators import sketch

    floats = [float(v) for v in vals]
    df = spark.createDataFrame([("g", v) for v in floats], ["g", "value"])
    hist = sketch.fp_histogram(df, "value", ["g"])
    row = sketch.histogram_quantiles(hist, ["g"], qs=(0.5, 0.9, 0.99)).collect()[0]
    sv = sorted(floats)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        want = sv[max(0, math.ceil(q * len(sv)) - 1)]
        assert getattr(row, col) == want, (q, sv)


# ---------------------------------------------------------------------------
# WAND losslessness under random corpora
# ---------------------------------------------------------------------------

_VOCAB = ["alpha", "beta", "gamma", "delta", "rho"]

_doc_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=6).map(" ".join),
    min_size=3,
    max_size=18,
)


@settings(max_examples=8, deadline=None)
@given(texts=_doc_texts, k=st.integers(min_value=1, max_value=5),
       max_seeds=st.sampled_from([1, 2, 1024]))
def test_bm25_wand_equals_exact_on_random_corpora(spark, texts, k, max_seeds):
    """The WAND prune must be lossless for ANY corpus/k/seed-cap — the
    adversarial surface is score ties against θ and tiny seed lists
    (max_seeds=1 stresses the weakest valid bound). Rows must match the
    exact operator EXACTLY (same scores, same ranks)."""
    from flink_tank_spark.operators import retrieval

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    qids = [0, 1]
    want = sorted(map(tuple, retrieval.bm25_topk(docs, qids, k=k).collect()))
    got = sorted(
        map(
            tuple,
            retrieval.bm25_wand_topk(docs, qids, k=k, max_seeds=max_seeds).collect(),
        )
    )
    assert got == want
