"""Deterministic scale-up replicator: sf0.1 × N → an sf{N/10} dataset.

No network and no reference data generator exist in this sandbox, so
scale-stress data is built by replicating the driver-generated sf0.1
parquet N times with KEY-OFFSET shifts (the round-3 verdict's recipe):
replica i shifts every entity key by i × (key-space size), so all
foreign keys stay internally consistent (orders of replica i reference
customers of replica i, lineitems reference orders/parts/suppliers of
replica i, …).

Relational tables copy non-key attributes verbatim — value
distributions per replica are exactly sf0.1's. ``documents`` and
``embeddings`` are MUTATED by default (round-6; the round-5 verdict's
top ask): verbatim replication made every doc/vector at sf≥1 a
factor-way exact-duplicate cluster, so dedup precision, ANN recall and
WAND pruning were degenerate by construction. Replica 0 stays verbatim;
each replica i ≥ 1 row becomes, deterministically by (seed, table,
replica, row):

- with probability ``--near-rate`` (default 0.2) a NEAR-DUPLICATE of
  its origin — documents get token-level edits at a per-doc rate drawn
  from [0.03, 0.12] (replace/delete/insert; token-Jaccard mostly
  0.8–0.97), embeddings get a bounded-angle jitter to a target cosine
  drawn from [0.90, 0.985];
- otherwise an INDEPENDENT row — documents resampled from the corpus
  vocabulary at the origin's length, embeddings redrawn Gaussian at the
  origin's norm.

Ground truth lands beside the tables as ``documents_truth.parquet`` /
``embeddings_truth.parquet`` (id, origin id, relation, target rate), so
LSH precision/recall and IVF recall curves are measured against KNOWN
relations instead of the degenerate replica structure. The gate is
unaffected structurally: DuckDB oracles read the SAME mutated files
(scripts/verify_gate.py <out-dir>), and every mutation is a pure
function of the seed. ``--no-mutate`` restores verbatim replication.

region/nation are fixed-cardinality dimensions at ANY scale factor
(TPC-H semantics) and are copied unchanged.

Usage:
    python scripts/make_sfn.py [--src /root/testdata/sf0.1] \
        [--out /root/repo/data/sf1] [--factor 10] \
        [--near-rate 0.2] [--seed 0] [--no-mutate]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> {column: key-space size} (offset = replica * size); key spaces
# measured from sf0.1 (all dense from 0, verified at build time below).
KEY_SPACES = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ("region", "nation")


def build(
    src: str,
    out: str,
    factor: int,
    mutate: bool = True,
    near_rate: float = 0.2,
    seed: int = 0,
) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # key-space sizes = max(key)+1 per entity, measured from the source
    # so the script works on any dense-keyed sf directory.
    sizes = {
        "customer": _span(con, src, "customer", "c_custkey"),
        "supplier": _span(con, src, "supplier", "s_suppkey"),
        "part": _span(con, src, "part", "p_partkey"),
        "orders": _span(con, src, "orders", "o_orderkey"),
        "events": _span(con, src, "events", "event_id"),
        "events_users": _span(con, src, "events", "user_id"),
        "documents": _span(con, src, "documents", "doc_id"),
        "embeddings": _span(con, src, "embeddings", "vec_id"),
    }

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keymap in KEY_SPACES.items():
        if mutate and t == "documents":
            _mutate_documents(src, out, factor, sizes["documents"], near_rate, seed)
            continue
        if mutate and t == "embeddings":
            _mutate_embeddings(src, out, factor, sizes["embeddings"], near_rate, seed)
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {sizes[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS i) ORDER BY i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


def _mutate_documents(
    src: str, out: str, factor: int, span: int, near_rate: float, seed: int
) -> None:
    """Replicate documents with controlled token-level mutation.

    Replica 0 = verbatim. Replica i ≥ 1 of each doc is a near-dup
    (token replace/delete/insert at a per-doc rate in [0.03, 0.12]) with
    probability ``near_rate``, else an independent doc resampled from
    the corpus vocabulary at the origin's token count. Everything is a
    pure function of (seed, replica, source row order), so rebuilds are
    bit-identical. Pure-Python token loop: sfN doc counts are small
    (5 k × factor) and this runs once per dataset build.
    """
    import pandas as pd

    src_pdf = pd.read_parquet(f"{src}/documents.parquet")
    vocab = sorted({tok for text in src_pdf["text"] for tok in text.split()})
    out_frames = [src_pdf]
    truth = [
        pd.DataFrame(
            {
                "doc_id": src_pdf["doc_id"],
                "origin_doc_id": src_pdf["doc_id"],
                "relation": "copy",
                "edit_rate": 0.0,
            }
        )
    ]
    import numpy as np

    for i in range(1, factor):
        rng = np.random.RandomState((seed * 1_000_003 + i * 7919) % 2**31)
        is_near = rng.rand(len(src_pdf)) < near_rate
        edit_rates = rng.uniform(0.03, 0.12, len(src_pdf))
        texts, relations, rates = [], [], []
        for row_idx, text in enumerate(src_pdf["text"]):
            toks = text.split()
            if is_near[row_idx]:
                r = edit_rates[row_idx]
                kept = []
                for tok in toks:
                    u = rng.rand()
                    if u < r:  # replace
                        kept.append(vocab[rng.randint(len(vocab))])
                    elif u < 1.5 * r:  # delete
                        continue
                    else:
                        kept.append(tok)
                        if rng.rand() < 0.5 * r:  # insert after
                            kept.append(vocab[rng.randint(len(vocab))])
                texts.append(" ".join(kept) if kept else vocab[0])
                relations.append("near")
                rates.append(float(r))
            else:
                n_toks = max(1, len(toks))
                texts.append(
                    " ".join(vocab[j] for j in rng.randint(0, len(vocab), n_toks))
                )
                relations.append("independent")
                rates.append(1.0)
        rep = src_pdf.copy()
        rep["doc_id"] = src_pdf["doc_id"] + i * span
        rep["text"] = texts
        rep["n_chars"] = [len(t) for t in texts]
        out_frames.append(rep)
        truth.append(
            pd.DataFrame(
                {
                    "doc_id": rep["doc_id"],
                    "origin_doc_id": src_pdf["doc_id"],
                    "relation": relations,
                    "edit_rate": rates,
                }
            )
        )
    all_docs = pd.concat(out_frames, ignore_index=True)
    all_docs.to_parquet(f"{out}/documents.parquet", index=False)
    pd.concat(truth, ignore_index=True).to_parquet(
        f"{out}/documents_truth.parquet", index=False
    )
    n_near = sum((t["relation"] == "near").sum() for t in truth)
    print(f"documents: {len(all_docs)} rows ({factor}x, mutated; {n_near} near-dups)")


def _mutate_embeddings(
    src: str, out: str, factor: int, span: int, near_rate: float, seed: int
) -> None:
    """Replicate embeddings with bounded-cosine jitter.

    Replica i ≥ 1 of vector v is, with probability ``near_rate``, a
    jittered copy at a target cosine drawn uniformly from [0.90, 0.985]
    (same norm, constructed as c·v̂ + √(1−c²)·ĝ with g Gaussian
    orthogonalized against v — the cosine is EXACTLY the target up to
    float32 rounding), else an independent Gaussian direction at the
    origin's norm. Near replicas keep the origin's label; independent
    ones redraw a label from the observed label set.
    """
    import numpy as np
    import pandas as pd

    src_pdf = pd.read_parquet(f"{src}/embeddings.parquet")
    V = np.stack([np.asarray(e, dtype=np.float64) for e in src_pdf["embedding"]])
    norms = np.linalg.norm(V, axis=1)
    labels = src_pdf["label"].to_numpy()
    label_set = np.sort(np.unique(labels))
    dim = V.shape[1]

    frames = [src_pdf]
    truth = [
        pd.DataFrame(
            {
                "vec_id": src_pdf["vec_id"],
                "origin_vec_id": src_pdf["vec_id"],
                "relation": "copy",
                "target_cosine": 1.0,
            }
        )
    ]
    for i in range(1, factor):
        rng = np.random.RandomState((seed * 2_000_003 + i * 104_729) % 2**31)
        is_near = rng.rand(len(V)) < near_rate
        target_cos = rng.uniform(0.90, 0.985, len(V))
        G = rng.randn(len(V), dim)
        new_vecs = np.empty_like(V)
        relations, t_cos = [], []
        for r_idx in range(len(V)):
            v, nv = V[r_idx], norms[r_idx]
            if nv == 0:  # zero-norm originals (none in fixtures): copy
                new_vecs[r_idx] = v
                relations.append("copy")
                t_cos.append(1.0)
                continue
            g = G[r_idx]
            if is_near[r_idx]:
                v_hat = v / nv
                g_perp = g - (g @ v_hat) * v_hat
                gp_n = np.linalg.norm(g_perp)
                if gp_n == 0:
                    new_vecs[r_idx] = v
                    relations.append("copy")
                    t_cos.append(1.0)
                    continue
                c = target_cos[r_idx]
                new_vecs[r_idx] = nv * (c * v_hat + np.sqrt(1.0 - c * c) * g_perp / gp_n)
                relations.append("near")
                t_cos.append(float(c))
            else:
                gn = np.linalg.norm(g)
                new_vecs[r_idx] = nv * g / gn if gn > 0 else v
                relations.append("independent")
                t_cos.append(0.0)
        rep = pd.DataFrame(
            {
                "vec_id": src_pdf["vec_id"] + i * span,
                "embedding": [
                    row.astype(np.float32).tolist() for row in new_vecs
                ],
                "label": np.where(
                    is_near, labels, label_set[rng.randint(0, len(label_set), len(V))]
                ).astype(np.int32),
            }
        )
        frames.append(rep)
        truth.append(
            pd.DataFrame(
                {
                    "vec_id": rep["vec_id"],
                    "origin_vec_id": src_pdf["vec_id"],
                    "relation": relations,
                    "target_cosine": t_cos,
                }
            )
        )
    all_emb = pd.concat(frames, ignore_index=True)
    # match the source dtype exactly (list<float32>) via explicit arrow schema
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(all_emb, schema=schema, preserve_index=False),
        f"{out}/embeddings.parquet",
    )
    pd.concat(truth, ignore_index=True).to_parquet(
        f"{out}/embeddings_truth.parquet", index=False
    )
    n_near = sum((t["relation"] == "near").sum() for t in truth)
    print(f"embeddings: {len(all_emb)} rows ({factor}x, mutated; {n_near} near-dups)")


def _span(con: duckdb.DuckDBPyConnection, src: str, t: str, key: str) -> int:
    lo, hi = con.execute(
        f"SELECT MIN({key}), MAX({key}) FROM '{src}/{t}.parquet'"
    ).fetchone()
    if lo != 0:
        raise ValueError(f"{t}.{key} not dense from 0 (min={lo})")
    return hi + 1


def main() -> int:
    ap = argparse.ArgumentParser(prog="make_sfn")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/data/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--near-rate", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--no-mutate",
        action="store_true",
        help="verbatim doc/embedding replicas (pre-round-6 degenerate mode)",
    )
    args = ap.parse_args()
    build(
        args.src,
        args.out,
        args.factor,
        mutate=not args.no_mutate,
        near_rate=args.near_rate,
        seed=args.seed,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
