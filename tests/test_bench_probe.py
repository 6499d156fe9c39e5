"""Wiring test for bench.py's two-pair scaling probe (mocked run_pair /
mp_ceiling — no Spark, no subprocesses): the probe must report BOTH the
8→32 pair and the 2→8 ``pair_low``, each with its own same-run machine
ceiling control, because the north rule's raw ≥0.8 gate is only
readable at 2→8 on this box (BENCH.md)."""

from __future__ import annotations


def test_scaling_probe_reports_both_pairs(monkeypatch):
    import bench
    import scripts.mp_ceiling as mpc
    import scripts.scaling_bench as sb

    calls = []

    def fake_run_pair(n, n_docs, repeats, doc_scale):
        calls.append((n, n_docs))
        mk = lambda c, s: {"cores": c, "build_sec": s,
                           "docs_per_sec": round(n_docs / s, 2),
                           "bm25_wand_p50_ms": 50.0}
        small, large = mk(n, 100.0), mk(4 * n, 30.0)
        return small, large, [small, large]

    def fake_ceiling(n, **kw):
        return {"procs_N": n, "procs_4N": 4 * n, "ceiling_efficiency": 0.9}

    monkeypatch.setattr(sb, "run_pair", fake_run_pair)
    monkeypatch.setattr(mpc, "mp_ceiling", fake_ceiling)

    out = bench._scaling_probe(36000)

    # both pairs present, at the configured core counts
    assert [c[0] for c in calls] == [bench.SCALING_N, bench.SCALING_LOW_N]
    assert out["cores_N"] == bench.SCALING_N
    assert out["cores_4N"] == 4 * bench.SCALING_N
    lo = out["pair_low"]
    assert lo["cores_N"] == bench.SCALING_LOW_N
    assert lo["cores_4N"] == 4 * bench.SCALING_LOW_N
    assert lo["n_docs"] == bench.SCALING_LOW_DOCS

    # efficiency = tput(4N) / (4 * tput(N)) on the mocked numbers
    expected_eff = round((1 / 30.0) / (4 * (1 / 100.0)), 4)
    assert out["efficiency"] == expected_eff
    assert lo["efficiency"] == expected_eff

    # each pair carries its own ceiling control and the ratio
    for blk in (out, lo):
        assert blk["machine_ceiling_control"]["ceiling_efficiency"] == 0.9
        assert blk["efficiency_vs_machine_ceiling"] == round(
            expected_eff / 0.9, 4
        )
        assert blk["all_runs"], "raw runs must ship with the summary"

    # serving p50 ships for BOTH legs (the pyarrow path is
    # Spark-parallelism-independent, so N-vs-4N is a weather A/B)
    assert out["serving_p50_ms_N"] == 50.0
    assert out["serving_p50_ms_4N"] == 50.0


def test_stage_attribution_tables():
    """Per-stage scaling attribution (VERDICT r04 ask #1): stage
    timings take the interleaved per-stage min, efficiency is
    T_N/(4·T_4N) per stage, and the vs-ceiling ratio divides by the
    window's measured ceiling. Stages missing from one leg are
    dropped from the ratio tables, not crashed on."""
    import bench

    runs = [
        {"cores": 8, "build_sec": 100.0,
         "stages": {"chain": 80.0, "encode": 15.0, "sidecar": 2.0}},
        {"cores": 8, "build_sec": 110.0,
         "stages": {"chain": 90.0, "encode": 14.0, "sidecar": 3.0}},
        {"cores": 32, "build_sec": 30.0,
         "stages": {"chain": 24.0, "encode": 5.0}},
        {"cores": 32, "build_sec": 32.0,
         "stages": {"chain": 25.0, "encode": 4.0}},
    ]
    t = bench._stage_efficiency(runs, 8, ceiling_eff=0.8)
    assert t["stages_sec_N"] == {"chain": 80.0, "encode": 14.0, "sidecar": 2.0}
    assert t["stages_sec_4N"] == {"chain": 24.0, "encode": 4.0}
    # chain: 80 / (4*24) = 0.8333; encode: 14 / (4*4) = 0.875
    assert t["stage_efficiency"] == {"chain": 0.8333, "encode": 0.875}
    assert t["stage_efficiency_vs_ceiling"] == {
        "chain": round(0.8333333333333334 / 0.8, 4),
        "encode": round(0.875 / 0.8, 4),
    }
    # sidecar exists only on the N leg: present in the timing table,
    # absent from the ratios
    assert "sidecar" not in t["stage_efficiency"]
