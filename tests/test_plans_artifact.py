"""Registry-wide plan-hygiene tripwire over the PLANS.md artifact
(regenerated each round by tools/explain_all.py): no CartesianProduct
anywhere, and non-Cross BroadcastNestedLoopJoin only where the build
side is bounded by construction. Complements tests/test_plan_shapes.py
(which captures the heavy operators' SUB-executions live): this file
audits all ~194 final plans in milliseconds at round close."""

from __future__ import annotations

import pathlib
import re

import pytest

#: queries whose FINAL plan legitimately carries a typed (non-Cross)
#: BNLJ — each with a bounded build side by construction:
#: - range_join_price_bands: a point-in-band range join against a
#:   broadcast band table that is a handful of rows by definition —
#:   the standard Spark plan for a small-dim range join.
#: - tpch_q22_shaped: Q22's scalar-subquery comparison
#:   (c_acctbal > <1-row global avg>) — the build side is one row.
TYPED_BNLJ_OK = {"range_join_price_bands", "tpch_q22_shaped"}

_TYPED = re.compile(
    r"BroadcastNestedLoopJoin (BuildLeft|BuildRight), "
    r"(Inner|LeftOuter|RightOuter|FullOuter|LeftSemi|LeftAnti|ExistenceJoin)"
    r"|BroadcastNestedLoopJoin "
    r"(Inner|LeftOuter|RightOuter|FullOuter|LeftSemi|LeftAnti|ExistenceJoin)"
)


def _sections() -> dict[str, str]:
    p = pathlib.Path("PLANS.md")
    if not p.exists():
        pytest.skip("PLANS.md not generated in this tree")
    txt = p.read_text(errors="replace")
    out: dict[str, str] = {}
    cur = None
    for chunk in re.split(r"^## ", txt, flags=re.M)[1:]:
        name, _, body = chunk.partition("\n")
        out[name.strip()] = body
    assert len(out) > 100, "PLANS.md truncated?"
    return out


def test_no_cartesian_product_in_any_recorded_plan():
    bad = [n for n, body in _sections().items() if "CartesianProduct" in body]
    assert not bad, bad


def test_typed_bnlj_only_in_bounded_build_allowlist():
    sections = _sections()  # parse the ~29k-line artifact once
    bad = []
    for name, body in sections.items():
        if _TYPED.search(body) and name not in TYPED_BNLJ_OK:
            bad.append(name)
    assert not bad, f"typed BroadcastNestedLoopJoin outside allowlist: {bad}"
    # the allowlist must not rot: entries with no typed BNLJ anymore
    # should be removed so the list stays an honest inventory
    stale = [
        n
        for n in TYPED_BNLJ_OK
        if n in sections and not _TYPED.search(sections[n])
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"
