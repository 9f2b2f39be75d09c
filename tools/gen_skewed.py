"""Hostile-distribution twin of a driver testdata dir (round 9).

Every fuzz generator and fixture so far draws near-uniform keys, so
the engine's skew defenses (AQE skew join, salted aggregation,
hot-bucket caps, exact-dup collapse) have only ever been exercised by
construction, never by data. This tool reads a uniform sf dir and
writes a skewed twin with the distributions a hostile real-world
corpus actually has:

* events   — one hot user owns ~22% of all rows; every other row
  re-draws user_id from a zipf(s=1.5) over the existing id pool; the
  modal event_type absorbs ~60% of rows. Stresses groupBy/topk/window
  partitions (one reducer key carries 1/5 of the table).
* orders   — one hot customer owns 20% of orders, rest zipf over the
  real customer keys. Stresses the orders⋈customer broadcast/shuffle.
* lineitem — one hot ORDER owns 10% of lineitems (join-fanout skew on
  the fact⋈fact sort-merge key: a single o_orderkey with 60k child
  rows at sf0.1 is exactly the shape AQE's skew-join split exists
  for); one hot supplier owns 25%; l_partkey goes zipf.
* documents — 90% of rows collapse to ONE language (the real shape of
  a web crawl); a CLIQUE-member EXACT-duplicate clique is appended
  (one 10k-doc connected component; the exact-dup collapse reduces it
  to a single representative, and all C(CLIQUE,2) intra pairs are
  emitted at jaccard 1.0 — a deterministic count the verifier
  asserts); a near-miss tier of NEAR_GROUPS×NEAR_PER docs whose
  cross-group Jaccard is deterministically BELOW the 0.8 threshold
  (hot shared tokens stress the LSH candidate→verify path, verify
  rejects every cross-group candidate); N_GIANT ~10 MB documents
  (giant-row memory/shuffle stress), each drawn from a DISJOINT token
  vocabulary so the giants never pair with anything.
* embeddings — 30% of vectors are replaced by one shared vector: a
  single hot cosine-LSH bucket / degenerate ANN neighborhood.

Dims (region/nation/customer/supplier/part) copy through unchanged —
skew lives in the fact-side foreign keys, which is where it lives in
production.

Deterministic (fixed numpy seed); pure pyarrow/numpy, no Spark.

Clique pair math (used by tools/skew_verify.py): the appended docs
contribute exactly C(CLIQUE, 2) + NEAR_GROUPS·C(NEAR_PER, 2) pairs to
any ≥0.8-Jaccard pair report (intra exact-dup pairs at 1.0; every
cross-group candidate deterministically rejected at 0.5303; no
appended token occurs in the original corpus), so pair-report counts
on the skewed dir equal the uniform-dir count plus that constant —
and the original docs' pair set / closure assignment is bit-identical
between the two dirs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816
CLIQUE = 10_000
NEAR_GROUPS = 50
NEAR_PER = 100
N_GIANT = 4
GIANT_MB = 10
HOT_USER_FRAC = 0.22
HOT_TYPE_FRAC = 0.60
HOT_CUST_FRAC = 0.20
HOT_ORDER_FRAC = 0.10
HOT_SUPP_FRAC = 0.25
HOT_LANG_FRAC = 0.90
HOT_VEC_FRAC = 0.30
ZIPF_S = 1.5


def _zipf_choice(rng: np.random.Generator, pool: np.ndarray, n: int) -> np.ndarray:
    """Draw n values from pool with P(rank r) ∝ 1/r^ZIPF_S (rank by
    pool order after a seeded shuffle, so the heavy ranks aren't the
    numerically-smallest keys)."""
    pool = pool.copy()
    rng.shuffle(pool)
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    return rng.choice(pool, size=n, p=p)


def _hot_mask(rng: np.random.Generator, n: int, frac: float) -> np.ndarray:
    m = np.zeros(n, dtype=bool)
    m[rng.choice(n, size=int(n * frac), replace=False)] = True
    return m


def skew_events(t: pa.Table, rng: np.random.Generator) -> pa.Table:
    n = t.num_rows
    users = t.column("user_id").to_numpy(zero_copy_only=False)
    pool = np.unique(users[~np.isnan(users.astype("float64"))]).astype("int64")
    hot_user = int(pool[0])
    new_users = _zipf_choice(rng, pool, n)
    hot = _hot_mask(rng, n, HOT_USER_FRAC)
    new_users[hot] = hot_user
    types = t.column("event_type").to_pandas()
    modal = types.mode().iloc[0]
    new_types = types.copy()
    new_types[_hot_mask(rng, n, HOT_TYPE_FRAC)] = modal
    return t.set_column(
        t.schema.get_field_index("user_id"), "user_id",
        pa.array(new_users, pa.int64()),
    ).set_column(
        t.schema.get_field_index("event_type"), "event_type",
        pa.array(new_types, pa.string()),
    )


def skew_orders(t: pa.Table, cust: pa.Table, rng: np.random.Generator) -> pa.Table:
    n = t.num_rows
    pool = cust.column("c_custkey").to_numpy().astype("int64")
    new_cust = _zipf_choice(rng, pool, n)
    new_cust[_hot_mask(rng, n, HOT_CUST_FRAC)] = int(pool[0])
    return t.set_column(
        t.schema.get_field_index("o_custkey"), "o_custkey",
        pa.array(new_cust, pa.int64()),
    )


def skew_lineitem(
    t: pa.Table, orders: pa.Table, part: pa.Table, supp: pa.Table,
    rng: np.random.Generator,
) -> pa.Table:
    n = t.num_rows
    okeys = t.column("l_orderkey").to_numpy().astype("int64")
    hot_order = int(orders.column("o_orderkey")[0].as_py())
    okeys = okeys.copy()
    okeys[_hot_mask(rng, n, HOT_ORDER_FRAC)] = hot_order
    skeys = _zipf_choice(rng, supp.column("s_suppkey").to_numpy().astype("int64"), n)
    skeys[_hot_mask(rng, n, HOT_SUPP_FRAC)] = int(
        supp.column("s_suppkey")[0].as_py()
    )
    pkeys = _zipf_choice(rng, part.column("p_partkey").to_numpy().astype("int64"), n)
    out = t.set_column(
        t.schema.get_field_index("l_orderkey"), "l_orderkey",
        pa.array(okeys, pa.int64()),
    )
    out = out.set_column(
        out.schema.get_field_index("l_suppkey"), "l_suppkey",
        pa.array(skeys, pa.int64()),
    )
    return out.set_column(
        out.schema.get_field_index("l_partkey"), "l_partkey",
        pa.array(pkeys, pa.int64()),
    )


def _rand_tokens(rng: np.random.Generator, n: int, prefix: str) -> list[str]:
    return [
        prefix + "".join(rng.choice(list("abcdefghjkmnpqrstuvwxyz"), 6))
        for _ in range(n)
    ]


def skew_documents(
    t: pa.Table, rng: np.random.Generator, n_giant: int = N_GIANT
) -> pa.Table:
    df = t.to_pandas()
    modal_lang = df["lang"].mode().iloc[0]
    hot = _hot_mask(rng, len(df), HOT_LANG_FRAC)
    df.loc[hot, "lang"] = modal_lang

    next_id = int(df["doc_id"].max()) + 1
    rows = []
    # --- exact-dup clique: CLIQUE identical docs = ONE closure
    # component whose every intra pair the dedup tier must emit at
    # jaccard 1.0 — deterministically C(CLIQUE, 2) pairs, so
    # tools/skew_verify.py can assert exact pair-count identities.
    big_text = " ".join(_rand_tokens(rng, 100, "zqk"))
    for _m in range(CLIQUE):
        rows.append((next_id, big_text, modal_lang, "skewgen", len(big_text)))
        next_id += 1
    # --- near-miss tier: NEAR_GROUPS groups of NEAR_PER exact dups.
    # Cross-group Jaccard is exactly 70/(70+31+31) ≈ 0.5303 — far
    # enough below the 0.8 threshold that the LSH verify REJECTS every
    # cross-group candidate deterministically (exercising the
    # candidate→verify path under shared hot tokens without making
    # pair counts depend on which hash function achieves a min).
    shared = _rand_tokens(rng, 70, "znr")
    for g in range(NEAR_GROUPS):
        text = " ".join(shared + _rand_tokens(rng, 31, f"zn{g:02d}"))
        for _m in range(NEAR_PER):
            rows.append((next_id, text, modal_lang, "skewgen", len(text)))
            next_id += 1
    # --- giant documents, disjoint vocabularies
    target_chars = GIANT_MB * 1_000_000
    for gi in range(n_giant):
        vocab = np.array(_rand_tokens(rng, 20_000, f"zg{gi}x"))
        n_toks = target_chars // 11  # ~10-char tokens + space
        text = " ".join(rng.choice(vocab, size=n_toks))
        rows.append((next_id, text, modal_lang, "skewgen", len(text)))
        next_id += 1

    import pandas as pd

    extra = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = pd.concat([df, extra], ignore_index=True)
    return pa.Table.from_pandas(out, schema=t.schema, preserve_index=False)


def skew_embeddings(t: pa.Table, rng: np.random.Generator) -> pa.Table:
    df = t.to_pandas()
    shared = None
    for v in df["embedding"]:
        if v is not None and len(v) and not any(x is None for x in v):
            shared = list(v)
            break
    hot = _hot_mask(rng, len(df), HOT_VEC_FRAC)
    df.loc[hot, "embedding"] = df.loc[hot, "embedding"].apply(lambda _: shared)
    return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)


def main() -> None:
    global CLIQUE
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/bdes_skew_sf0.1")
    ap.add_argument("--clique", type=int, default=CLIQUE)
    # --giants 0 builds the winnowing-oracle twin: the skew and the
    # clique are identical, only the 10 MB rows are absent — DuckDB's
    # VARCHAR[i] indexing is O(i), so the winnowing oracle's per-char
    # rolling-hash CTE is O(len²) per document (measured 15 s at 160 kB
    # → ~50 ks at 10 MB), an oracle-side artifact the Spark kernel
    # (numpy correlate, linear) doesn't share.
    ap.add_argument("--giants", type=int, default=N_GIANT)
    args = ap.parse_args()
    CLIQUE = args.clique

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    tables = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    out = dict(tables)
    out["events"] = skew_events(tables["events"], rng)
    out["orders"] = skew_orders(tables["orders"], tables["customer"], rng)
    out["lineitem"] = skew_lineitem(
        tables["lineitem"], tables["orders"], tables["part"],
        tables["supplier"], rng,
    )
    out["documents"] = skew_documents(tables["documents"], rng, args.giants)
    out["embeddings"] = skew_embeddings(tables["embeddings"], rng)
    for name, tbl in out.items():
        pq.write_table(tbl, os.path.join(args.out, f"{name}.parquet"))
    print(f"wrote skewed twin of {args.src} -> {args.out} "
          f"(clique={CLIQUE}, giants={args.giants}x{GIANT_MB}MB)")


if __name__ == "__main__":
    main()
