"""Sweep every registry query under a session created with
spark.sql.ansi.enabled=true and compare its result value-hash against
the permissive-mode run of the same query (sf0.001). Reports CRASH
(the query threw), DIFF (value hash changed), or ok.

Two modes:

* default — proves registry builders pin their own semantics on ANY
  session they are handed (``_t`` → ``tune_session`` applies
  RUNTIME_CONF, which includes ansi=false), so a Spark-4 foreign
  session — where ANSI defaults ON — gets neither crashes nor silent
  value changes from the 222-query surface. The builders normalize
  the conf before any expression runs, so this mode does NOT execute
  expressions under strictness.
* ``--deep`` — strips ansi from RUNTIME_CONF first, so tune_session
  leaves the ANSI setting alone and every registry expression
  actually executes under spark.sql.ansi.enabled=true (verified
  after each query). This is the strong claim: no expression in the
  surface relies on permissive wraparound/cast-to-NULL for its
  values.

Operator-level exposure (user calls a function directly with an ANSI
session) is additionally pinned by tests/test_ansi_safety.py. Run the
deep sweep when touching arithmetic. Last full runs (sf0.001):
default 222 ok / 0 crash / 0 diff; --deep 222 ok / 0 crash / 0 diff.
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


def main(names, deep=False):
    import __spark_entry__ as entry
    import big_data_exercise_spark.session as S
    from big_data_exercise_spark.session import get_spark

    perm = get_spark("ansi-sweep", cpus=8, shuffle_partitions=8)
    qs = entry.queries()
    names = names or list(qs)

    # Permissive pass first (in deep mode the RUNTIME_CONF mutation
    # below must not affect it).
    h_perm = {}
    for name in names:
        try:
            h_perm[name] = vhash(qs[name](perm, SF_DIR).toPandas())
        except Exception:
            print(f"{name}: PERMISSIVE-CRASH (pre-existing, not ANSI)")
            traceback.print_exc(limit=3)

    if deep:
        # tune_session re-applies RUNTIME_CONF inside every builder;
        # dropping the ansi key means the ANSI session below keeps its
        # strict setting while every expression executes.
        S.RUNTIME_CONF.pop("spark.sql.ansi.enabled", None)
    ansi = perm.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    ansi.conf.set("spark.sql.shuffle.partitions", "8")

    crash, diff, ok = [], [], []
    for i, name in enumerate(names):
        if name not in h_perm:
            continue
        try:
            h_ansi = vhash(qs[name](ansi, SF_DIR).toPandas())
            if deep:
                assert (
                    ansi.conf.get("spark.sql.ansi.enabled") == "true"
                ), f"{name}: a builder reset ANSI — deep mode is not measuring strictness"
        except AssertionError:
            raise
        except Exception as e:
            crash.append(name)
            msg = next(
                (l for l in str(e).splitlines() if l.strip()), type(e).__name__
            )[:220]
            print(f"{name}: CRASH {msg}")
            continue
        if h_ansi != h_perm[name]:
            diff.append(name)
            print(f"{name}: DIFF")
        else:
            ok.append(name)
        if (i + 1) % 25 == 0:
            print(f"-- {i+1}/{len(names)} done, {len(crash)} crash, {len(diff)} diff", flush=True)
    print(f"SUMMARY mode={'deep' if deep else 'default'} ok={len(ok)} crash={len(crash)} diff={len(diff)}")
    print("CRASH:", ", ".join(crash) if crash else "none")
    print("DIFF:", ", ".join(diff) if diff else "none")


if __name__ == "__main__":
    argv = sys.argv[1:]
    deep = "--deep" in argv
    main([a for a in argv if a != "--deep"], deep=deep)
