"""Result-invariance-under-parallelism sweep: every registry query
must produce the same value hash at spark.sql.shuffle.partitions = 1,
8 (the oracle gate's setting), and 32. Catches hidden dependence on
shuffle layout — per-partition limits, first/last without total
order, partition-local tie-breaks. sf0.001."""
import hashlib
import sys
import traceback

import pandas as pd

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def main(names):
    import __spark_entry__ as entry
    from big_data_exercise_spark.session import get_spark

    base = get_spark("par-sweep", cpus=8, shuffle_partitions=8)
    qs = entry.queries()
    names = names or list(qs)

    sessions = {}
    for n_part in (1, 8, 32):
        s = base.newSession()
        s.conf.set("spark.sql.shuffle.partitions", str(n_part))
        sessions[n_part] = s

    bad, crash = [], []
    for i, name in enumerate(names):
        hs = {}
        err = None
        for n_part, s in sessions.items():
            try:
                hs[n_part] = vhash(qs[name](s, SF_DIR).toPandas())
                assert s.conf.get("spark.sql.shuffle.partitions") == str(n_part), (
                    f"{name}: builder reset shuffle.partitions"
                )
            except AssertionError:
                raise
            except Exception as e:
                err = e
                break
        if err is not None:
            crash.append(name)
            msg = next((l for l in str(err).splitlines() if l.strip()), type(err).__name__)[:200]
            print(f"{name}: CRASH@{n_part} {msg}")
            continue
        if len(set(hs.values())) != 1:
            bad.append(name)
            print(f"{name}: VARIES {hs}")
        if (i + 1) % 25 == 0:
            print(f"-- {i+1}/{len(names)}: {len(crash)} crash, {len(bad)} vary", flush=True)
    print(f"SUMMARY checked={len(names)} crash={len(crash)} vary={len(bad)}")
    print("CRASH:", ", ".join(crash) if crash else "none")
    print("VARY:", ", ".join(bad) if bad else "none")


if __name__ == "__main__":
    main(sys.argv[1:])
