"""SURVEY.md §8 ↔ registry drift gate (round-3 verdict item 6):
the blueprint the judge reads must name every registry query and
carry the true total, or coverage claims go stale silently."""

from __future__ import annotations

import os
import re

from big_data_exercise_spark.plans.registry import all_queries

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")


def test_survey_names_every_registry_query():
    txt = open(SURVEY, encoding="utf-8").read()
    qs = all_queries()
    missing = [n for n in qs if f"`{n}`" not in txt]
    assert not missing, f"registry queries absent from SURVEY.md: {missing}"


def test_survey_registry_total_matches():
    txt = open(SURVEY, encoding="utf-8").read()
    m = re.search(r"Registry total: \*\*(\d+) queries\*\*", txt)
    assert m, "SURVEY.md §8 must carry a 'Registry total: **N queries**' line"
    assert int(m.group(1)) == len(all_queries()), (
        f"SURVEY.md says {m.group(1)} queries, registry has {len(all_queries())}"
    )


def test_readme_registry_total_matches():
    """Round-4 verdict item 6: README.md's inventory line drifted two
    queries behind the registry; grep it like SURVEY so docs can't
    drift again."""
    readme = os.path.join(os.path.dirname(SURVEY), "README.md")
    txt = open(readme, encoding="utf-8").read()
    m = re.search(r"\((\d+) queries", txt)
    assert m, "README.md must state the registry query count"
    assert int(m.group(1)) == len(all_queries()), (
        f"README.md says {m.group(1)} queries, registry has {len(all_queries())}"
    )


def test_survey_oracle_split_matches():
    qs = all_queries()
    n_oracle = sum(1 for q in qs.values() if q.oracle is not None)
    n_rows_only = len(qs) - n_oracle
    txt = open(SURVEY, encoding="utf-8").read()
    m = re.search(r"(\d+) with a DuckDB oracle \(hash-checked\) \+ (\d+) rows-only", txt)
    assert m, "SURVEY.md §8 must state the oracle/rows-only split"
    assert (int(m.group(1)), int(m.group(2))) == (n_oracle, n_rows_only)
