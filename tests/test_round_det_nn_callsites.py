"""Domain lanes for every ``round_det_nn`` call site.

``round_det_nn`` (functions/numeric.py) is ``round_det``'s x >= 0
branch with a SINGLE argument reference — the form that is safe to
ride a pushed join-condition predicate without Catalyst replicating an
expensive argument per reference. The price: its out-of-domain
behavior silently diverges (NaN -> 0.0 via the FLOOR double->long
coercion; negative exact ties round toward +inf instead of away from
zero). Correctness therefore rests on per-call-site domain reasoning.

This module is the template the round-6 advice asked for: EVERY new
caller of ``round_det_nn`` must register a lane here.

* ``test_every_call_site_has_a_domain_lane`` greps the package source
  and fails the build when a call site appears without a registered
  lane — the forcing function.
* Each lane runs the caller's REAL pipeline twice over an adversarial
  corpus (empty / whitespace / single-token / identical / disjoint
  docs — the inputs most likely to push a ratio out of domain), once
  as shipped and once with ``round_det_nn`` monkeypatched to the
  fully-guarded ``round_det``. Any out-of-domain argument makes the
  two runs diverge (NaN maps to 0.0 in one and NaN in the other;
  negatives surface as negative outputs), so bit-identical results +
  an explicit [0, 1] output bound pin the domain claim on the
  pipeline itself rather than on a re-derived expression.
"""

from __future__ import annotations

import math
import os
import re

import pytest

from big_data_exercise_spark.functions.numeric import round_det

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "big_data_exercise_spark",
)

# module path (relative to the package dir) -> lane test name.
# Registering a lane means: add the file here AND write a
# test_domain_* lane below that exercises the caller's pipeline via
# _assert_nn_matches_guarded.
REGISTERED_LANES = {
    os.path.join("dedup", "ssjoin.py"): "test_domain_ssjoin",
    os.path.join("dedup", "minhash.py"): "test_domain_minhash",
    os.path.join("dedup", "ngram.py"): "test_domain_ngram",
}


def _call_site_files() -> set[str]:
    sites: set[str] = set()
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            if rel == os.path.join("functions", "numeric.py"):
                continue  # the definition itself
            with open(path, encoding="utf-8") as f:
                src = f.read()
            # a *use* is a call or an import, not a mention in a comment
            if re.search(r"^\s*[^#\n]*round_det_nn\(", src, re.M) or re.search(
                r"import .*\bround_det_nn\b", src
            ):
                sites.add(rel)
    return sites


def test_every_call_site_has_a_domain_lane():
    sites = _call_site_files()
    missing = sites - set(REGISTERED_LANES)
    assert not missing, (
        f"round_det_nn call sites without a registered domain lane: "
        f"{sorted(missing)} — add a lane to "
        f"tests/test_round_det_nn_callsites.py (the function's "
        f"out-of-domain behavior is silently wrong; see its docstring)"
    )
    stale = set(REGISTERED_LANES) - sites
    assert not stale, f"registered lanes for files no longer calling it: {sorted(stale)}"


# Adversarial corpus: the inputs most likely to drive a token-overlap
# ratio out of [0, 1] — empty and whitespace-only docs (0-token sets),
# a single repeated token, exact duplicates (ratio == 1 tie), near
# misses, and fully disjoint docs (ratio == 0 boundary).
_ADVERSARIAL_DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta epsilon"),           # exact dup of 1
    (3, "alpha beta gamma delta zeta"),              # near dup of 1
    (4, ""),                                         # empty
    (5, "   "),                                      # whitespace only
    (6, "solo"),                                     # single token
    (7, "solo"),                                     # dup of the single token
    (8, "totally different words here entirely"),    # disjoint
    (9, "alpha alpha alpha alpha"),                  # one distinct token
    (10, "beta\tgamma\ndelta  epsilon alpha"),       # mixed whitespace
]


def _docs(spark):
    return spark.createDataFrame(_ADVERSARIAL_DOCS, "doc_id long, text string")


def _rows(df):
    pdf = df.toPandas()
    return sorted(
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def _assert_nn_matches_guarded(monkeypatch, module, build, score_col):
    """Run ``build()`` as shipped and with round_det_nn -> round_det;
    assert bit-identical rows and every score finite in [0, 1]."""
    shipped = _rows(build())
    monkeypatch.setattr(module, "round_det_nn", lambda c, s=2: round_det(c, s))
    guarded = _rows(build())
    assert shipped == guarded, (
        "pipeline output changed when round_det_nn was swapped for the "
        "fully-guarded round_det — an argument left the non-negative-"
        "finite domain"
    )
    for row in shipped:
        v = row[score_col]
        assert v is not None and 0.0 <= v <= 1.0, f"score out of [0,1]: {row}"


def test_domain_ssjoin(spark, monkeypatch):
    from big_data_exercise_spark.dedup import ssjoin

    _assert_nn_matches_guarded(
        monkeypatch,
        ssjoin,
        # threshold 0 admits every candidate the prefix filter emits —
        # the widest surface the jaccard expression ever sees
        lambda: ssjoin.exact_jaccard_pairs(_docs(spark), threshold=0.05),
        score_col=2,
    )


def test_domain_minhash(spark, monkeypatch):
    from big_data_exercise_spark.dedup import minhash

    _assert_nn_matches_guarded(
        monkeypatch,
        minhash,
        lambda: minhash.near_duplicates(
            _docs(spark), threshold=0.05, use_vocab_ranks=True
        ),
        score_col=2,
    )


def test_domain_ngram(spark, monkeypatch):
    from big_data_exercise_spark.dedup import ngram

    _assert_nn_matches_guarded(
        monkeypatch,
        ngram,
        lambda: ngram.pairwise_jaccard(_docs(spark), min_jaccard=0.05),
        score_col=2,
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
