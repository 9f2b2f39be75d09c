"""Sweep every registry query under a session created with
spark.sql.ansi.enabled=true and compare its result value-hash against
the permissive-mode run of the same query (sf0.001). Reports CRASH
(the query threw), DIFF (value hash changed), or ok.

What a clean sweep proves, precisely: registry builders pin their own
semantics on ANY session they are handed (``_t`` → ``tune_session``
applies RUNTIME_CONF, which includes ansi=false), so a Spark-4 foreign
session — where ANSI defaults ON — gets neither crashes nor silent
value changes from the 222-query surface. It does NOT exercise the
operator-level API under ANSI strictness (the builders normalize the
conf before any expression runs); that exposure is covered by
tests/test_ansi_safety.py, which calls the operator functions directly
under ANSI=true and pins result-identity. Run both when touching
arithmetic. Last full sweep: 222 ok / 0 crash / 0 diff.
"""
import hashlib
import os
import sys
import traceback

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    csv = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(csv.encode()).hexdigest()


def main(names):
    import __spark_entry__ as entry
    from big_data_exercise_spark.session import get_spark

    perm = get_spark("ansi-sweep", cpus=8, shuffle_partitions=8)
    ansi = perm.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    ansi.conf.set("spark.sql.shuffle.partitions", "8")
    qs = entry.queries()
    names = names or list(qs)
    crash, diff, ok = [], [], []
    for i, name in enumerate(names):
        try:
            h_perm = vhash(qs[name](perm, SF_DIR).toPandas())
        except Exception:
            print(f"{name}: PERMISSIVE-CRASH (pre-existing, not ANSI)")
            traceback.print_exc(limit=3)
            continue
        try:
            h_ansi = vhash(qs[name](ansi, SF_DIR).toPandas())
        except Exception as e:
            crash.append(name)
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            print(f"{name}: CRASH {msg}")
            continue
        if h_ansi != h_perm:
            diff.append(name)
            print(f"{name}: DIFF")
        else:
            ok.append(name)
        if (i + 1) % 25 == 0:
            print(f"-- {i+1}/{len(names)} done, {len(crash)} crash, {len(diff)} diff", flush=True)
    print(f"SUMMARY ok={len(ok)} crash={len(crash)} diff={len(diff)}")
    print("CRASH:", ", ".join(crash) if crash else "none")
    print("DIFF:", ", ".join(diff) if diff else "none")


if __name__ == "__main__":
    main(sys.argv[1:])
