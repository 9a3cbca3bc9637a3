"""Gate: every committed DuckDB oracle must be DETERMINISTIC across
fresh connections and thread counts — the round-6 lesson, where a tied
two-scan interval sweep made a green CORRECTNESS row a coin flip
(q_dedup_span_coverage flipped covered_tokens 78/156 between
connections). scripts/oracle_determinism.py is the committed harness;
this test runs it over the FULL registry so a newly added oracle with a
tied ORDER BY fails CI, not the driver's harness three rounds later.

The known-risky window-sweep oracles get extra runs: their instability
(when present) shows up under PARALLEL merges, which vary run-to-run.
"""

from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
_SCRIPTS = str(ROOT / "scripts")
sys.path.insert(0, _SCRIPTS)
try:
    from oracle_determinism import audit
finally:
    # remove by VALUE: importing oracle_determinism itself inserts the
    # repo root at index 0, so pop(0) would evict the wrong entry and
    # leave the scripts dir on sys.path permanently (ADVICE r7)
    sys.path.remove(_SCRIPTS)


def test_all_oracles_deterministic(sf_dir):
    res = audit(sf_dir, runs=3)
    flaky = {n: r for n, r in res.items() if not r["stable"]}
    assert not flaky, f"nondeterministic oracles: {flaky}"


def test_tied_frame_sweeps_extra_runs(sf_dir):
    # The ROWS-BETWEEN-...-1-PRECEDING family (interval sweeps, funnel /
    # CEP scans, life tables, histogram quantiles): each site's ORDER BY
    # is total by a documented uniqueness argument; verify the hardest
    # ones with more fresh connections than the registry-wide pass.
    risky = [
        "q_dedup_span_coverage",   # DISTINCT(doc_id,s,e) => (s,e) total per doc
        "q_funnel_ordered",        # ORDER BY (us, event_id); event_id unique
        "q_cep_pattern",           # ORDER BY (us, event_id); event_id unique
        "q_attribution_last_touch",  # ORDER BY (ts, event_id); event_id unique
        "q_pareto_frontier",       # tiebreak p_partkey ASC; p_partkey unique
        "q_kaplan_meier",          # ORDER BY dur_days; grouped-by key, unique
        "q_logrank",               # ORDER BY dur; grouped-by key, unique
        "q_quantile_sketch",       # ORDER BY b; grouped-by key, unique
        "q_stream_quantile",       # ORDER BY b; grouped-by key, unique
        "q_sequential_ab",         # ORDER BY day; grouped-by key, unique
    ]
    import __spark_entry__ as entry

    known = [n for n in risky if n in entry.oracle_sql()]
    res = audit(sf_dir, runs=6, only=known)
    flaky = {n: r for n, r in res.items() if not r["stable"]}
    assert not flaky, f"tied-frame oracle flaked: {flaky}"
