"""Pure-Python tests of bench.py's flake-retry merge policy (VERDICT
r9 #4): no Spark session — synthetic ratios only. The policy under
test: a failing entry's retry keeps the BETTER ratio only when the
entry has a documented noise band (exemption reason); otherwise it
keeps the WORSE ratio, so a pass requires BOTH measurements under
budget and a genuine marginal regression cannot slip through on one
lucky draw.
"""

from __future__ import annotations

import bench


def test_merge_retry_band_entries_keep_better():
    # documented-band entry: legacy lenient policy (min)
    assert bench._merge_retry(4.2, 3.1, has_band=True) == 3.1
    assert bench._merge_retry(3.1, 4.2, has_band=True) == 3.1


def test_merge_retry_strict_entries_keep_worse():
    # no documented band: the retry must CONFIRM the failure was
    # spurious — keeping the max means first-run failures stand unless
    # both draws land under budget (which a first failure precludes)
    assert bench._merge_retry(3.4, 2.1, has_band=False) == 3.4
    assert bench._merge_retry(2.1, 3.4, has_band=False) == 3.4


def test_merge_retry_none_is_infinity():
    # None (base rounded to 0.0) = unmeasurable = infinity: any finite
    # measurement replaces it under min and wins under max
    assert bench._merge_retry(None, 2.5, has_band=True) == 2.5
    assert bench._merge_retry(2.5, None, has_band=True) == 2.5
    assert bench._merge_retry(None, 2.5, has_band=False) is None
    assert bench._merge_retry(2.5, None, has_band=False) is None
    assert bench._merge_retry(None, None, has_band=True) is None
    assert bench._merge_retry(None, None, has_band=False) is None


def test_merge_retry_marginal_regression_scenario():
    """The exact failure mode the round-9 VERDICT called out: a real
    ~20% regression (true ratio 3.6 vs budget 3.0) whose noisy retry
    happens to land at 2.9 must NOT pass for an undocumented entry."""
    budget = 3.0
    merged = bench._merge_retry(3.6, 2.9, has_band=False)
    assert merged == 3.6 and merged > budget  # stays red
    # the same draw on a documented-band entry passes (its widened
    # budget + recorded spread justify the lenient merge)
    assert bench._merge_retry(3.6, 2.9, has_band=True) == 2.9


def test_budget_tables_reason_marks_band():
    """The has_band flag used by both retry loops is 'the budget entry
    carries an exemption/reason string' — spot-check the tables keep
    that invariant (every reason is a non-empty string or None)."""
    for table in (bench.SF1_BUDGETS, bench.SF10_BUDGETS):
        for name, (budget, reason) in table.items():
            assert budget > 0
            assert reason is None or (
                isinstance(reason, str) and len(reason) > 10
            ), name
    # entries the round-8 record documents as steal-noisy carry bands
    assert bench.SF1_BUDGETS["minhash_production"][1] is not None
    assert bench.SF1_BUDGETS["llm_decontaminate"][1] is not None
