"""Generate an sf1-scale testdata dir by 10×-replicating sf0.1 with
FRESH content (round 9).

Naive replication would make every document a 10-member exact-dup
clique and every event a 10-way tie — artifacts that turn the pair
oracles quadratic and say nothing about sf-dependence. This
generator replicates with content variation instead:

* all key columns shift by replica·(max+1) so replicas never collide
  (and fact↔dim references stay consistent: orders.o_custkey shifts
  by the CUSTOMER key stride, lineitem.l_orderkey by the ORDERS
  stride, …);
* document text has every TOKEN prefixed with the replica id
  (whitespace runs preserved byte-for-byte, so dirty-text statistics
  survive) — within-replica similarity structure is preserved
  exactly, while replicas share zero tokens, so pair reports scale as
  10× the per-replica pair count instead of going quadratic on
  cross-replica near-dups (a 1-token tag would leave cross-replica
  Jaccard at t/(t+1) ≈ 0.99 and multiply the pair tables by ~100×);
  n_chars recomputed for rep > 0;
* embeddings perturb their last element by replica·2^-10 (exact in
  float32) — no cross-replica identical vectors;
* event/order timestamps shift by replica microseconds — keeps the
  time distribution, breaks total ties;
* region/nation stay fixed (dims, as in TPC-H scaling).

Deterministic, pure pyarrow/pandas. Usage:
    python tools/gen_sf1.py [--src /root/testdata/sf0.1] \
        [--out /tmp/bdes_sf1] [--factor 10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def stride(s: pd.Series) -> int:
    return int(s.max()) + 1


def replicate(df: pd.DataFrame, factor: int, shifts: dict[str, int],
              ts_cols: tuple[str, ...] = ()) -> list[pd.DataFrame]:
    out = []
    for rep in range(factor):
        d = df.copy()
        for col, st in shifts.items():
            d[col] = d[col] + rep * st
        for col in ts_cols:
            d[col] = d[col] + pd.to_timedelta(rep, unit="us")
        out.append(d)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/bdes_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    f = args.factor

    t = {
        n: pq.read_table(os.path.join(args.src, f"{n}.parquet"))
        for n in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split()
    }
    dfs = {n: tb.to_pandas() for n, tb in t.items()}
    st_cust = stride(dfs["customer"]["c_custkey"])
    st_ord = stride(dfs["orders"]["o_orderkey"])
    st_part = stride(dfs["part"]["p_partkey"])
    st_supp = stride(dfs["supplier"]["s_suppkey"])
    st_ev = stride(dfs["events"]["event_id"])
    st_user = stride(dfs["events"]["user_id"].dropna().astype("int64"))
    st_doc = stride(dfs["documents"]["doc_id"])
    st_vec = stride(dfs["embeddings"]["vec_id"])

    parts: dict[str, list[pd.DataFrame]] = {
        "region": [dfs["region"]],
        "nation": [dfs["nation"]],
        "customer": replicate(dfs["customer"], f, {"c_custkey": st_cust}),
        "supplier": replicate(dfs["supplier"], f, {"s_suppkey": st_supp}),
        "part": replicate(dfs["part"], f, {"p_partkey": st_part}),
        "orders": replicate(
            dfs["orders"], f,
            {"o_orderkey": st_ord, "o_custkey": st_cust}, ("o_orderdate",),
        ),
        "lineitem": replicate(
            dfs["lineitem"], f,
            {"l_orderkey": st_ord, "l_partkey": st_part, "l_suppkey": st_supp},
            ("l_shipdate",),
        ),
        "events": replicate(
            dfs["events"], f,
            {"event_id": st_ev, "user_id": st_user}, ("ts",),
        ),
    }

    docs = []
    for rep in range(f):
        d = dfs["documents"].copy()
        d["doc_id"] = d["doc_id"] + rep * st_doc
        if rep:
            import re

            ws = re.compile(r"(\s+)")
            pref = f"r{rep}x"

            def prefix_tokens(s, pref=pref, ws=ws):
                if not isinstance(s, str):
                    return s
                return "".join(
                    p if not p or p.isspace() else pref + p
                    for p in ws.split(s)
                )

            d["text"] = d["text"].map(prefix_tokens)
            # recompute n_chars only where text changed — replica 0
            # keeps the driver's own values verbatim (whatever its
            # convention or deliberate dirt)
            d["n_chars"] = d["text"].str.len().astype("float").fillna(
                d["n_chars"]
            ).astype("int64")
        docs.append(d)
    parts["documents"] = docs

    embs = []
    for rep in range(f):
        d = dfs["embeddings"].copy()
        d["vec_id"] = d["vec_id"] + rep * st_vec
        if rep:
            eps = np.float32(rep * 2.0**-10)

            def bump(v, eps=eps):
                if v is None or len(v) == 0 or v[-1] is None:
                    return v
                w = list(v)
                w[-1] = np.float32(w[-1]) + eps
                return w

            d["embedding"] = d["embedding"].apply(bump)
        embs.append(d)
    parts["embeddings"] = embs

    for name, chunks in parts.items():
        out = pd.concat(chunks, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(out, schema=t[name].schema,
                                 preserve_index=False),
            os.path.join(args.out, f"{name}.parquet"),
        )
    print(f"wrote {f}x replica of {args.src} -> {args.out}")


if __name__ == "__main__":
    main()
