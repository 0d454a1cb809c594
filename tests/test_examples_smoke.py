"""Import/run smoke tests for the example entry points (tiny CPU configs)."""

import runpy
import sys

import numpy as np
import pytest


def _run(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def test_train_ppo_any_smoke(capsys):
    _run("examples/train_ppo_any.py",
         ["--env", "transport", "--iterations", "2", "--num-envs", "8"])
    assert "mean_reward" in capsys.readouterr().out


def test_generate_ns_target_smoke(tmp_path):
    out = str(tmp_path / "t.npz")
    _run("examples/generate_ns_target.py", ["--out", out])
    data = np.load(out)
    assert data["u"].shape == (200, 21, 21)
    assert abs(data["u"][-1].max() - 2.0) < 0.5  # lid velocity reached


def test_eval_compare_transport_no_rl(capsys):
    _run("examples/eval_compare_transport.py",
         ["--ppo-iters", "0", "--episodes", "4"])
    out = capsys.readouterr().out
    assert "backstepping" in out and "zero" in out


def test_neuron_growth_smoke(capsys):
    _run("examples/neuron_growth.py", ["--steps", "50"])
    assert "axon length" in capsys.readouterr().out


def test_eval_compare_rd_no_rl(capsys):
    _run("examples/eval_compare_reaction_diffusion.py",
         ["--ppo-iters", "0", "--episodes", "2"])
    assert "backstepping" in capsys.readouterr().out


def test_multichip_ppo_smoke(capsys):
    _run("examples/multichip_ppo.py",
         ["--iterations", "2", "--envs-per-device", "4"])
    out = capsys.readouterr().out
    assert "params replicated across mesh: True" in out


def test_bench_scaling_smoke(capsys):
    """Scaling-efficiency harness runs mesh sizes {1,2} on the virtual mesh
    and emits one JSON line per mesh size with an efficiency field."""
    import json

    _run("bench_scaling.py",
         ["--mesh-sizes", "1,2", "--envs-per-device", "4",
          "--agent-steps", "2", "--repeats", "1"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    rows = [json.loads(l) for l in lines]
    assert rows[0]["mesh_size"] == 1 and rows[1]["mesh_size"] == 2
    assert rows[0]["efficiency"] == 1.0
    assert rows[1]["value"] > 0


def test_bench_families_smoke(capsys):
    """Per-family throughput harness emits one JSON line per family."""
    import json

    _run("bench_families.py",
         ["--envs", "8", "--repeats", "1", "--steps", "3"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [json.loads(l) for l in lines]
    assert [r["env"] for r in rows] == ["traffic", "neuron", "brain_tumor",
                                        "ns_matpow"]
    assert all(r["value"] > 0 for r in rows)


def test_eval_compare_ns_smoke(capsys):
    """NS quality-matrix script: trains tiny PPO+SAC on the tracking task and
    prints the comparison table (constant-lid must beat zero)."""
    _run("examples/eval_compare_ns.py",
         ["--episodes", "4", "--ppo-iters", "2", "--sac-iters", "2",
          "--eval-every", "1"])
    out = capsys.readouterr().out
    assert "constant-lid" in out and "ppo" in out and "sac" in out

    def row(name):
        line = [l for l in out.splitlines() if l.strip().startswith(name)][0]
        return float(line.split("|")[1])

    assert row("constant-lid") > row("zero")


def test_eval_compare_traffic_smoke(capsys):
    """Traffic comparison: backstepping row always present; tiny PPO runs."""
    _run("examples/eval_compare_traffic.py",
         ["--ppo-iters", "2", "--eval-every", "1"])
    out = capsys.readouterr().out
    assert "backstepping" in out and "ppo" in out
    bck = [l for l in out.splitlines() if l.strip().startswith("backstepping")][0]
    total, steps = float(bck.split("|")[1]), int(bck.split("|")[3])
    assert -400.0 < total < 0.0  # cumulative tracking penalty over 960 steps
    assert 0 < steps <= 960


def test_eval_compare_rd_sac_smoke(capsys):
    """RD comparison script with SAC path enabled (tiny budget)."""
    _run("examples/eval_compare_reaction_diffusion.py",
         ["--episodes", "4", "--ppo-iters", "0", "--sac-iters", "2",
          "--eval-every", "1"])
    out = capsys.readouterr().out
    assert "backstepping" in out and "sac" in out


def test_plot_training_curves_smoke(tmp_path, capsys):
    """The figure pipeline regenerates from the COMMITTED training run."""
    out = str(tmp_path / "curve.png")
    _run("examples/plot_training_curves.py", ["--out", out])
    assert "wrote" in capsys.readouterr().out
    import os

    assert os.path.getsize(out) > 1000


def test_spatial_sharding_demo_smoke(capsys, monkeypatch):
    # the demo sizes nx=4096 for realism; shrink via its module constants?
    # it reads no argv — just run it (conftest already provides the
    # 8-device CPU mesh, and the demo's env pinning is a no-op then)
    _run("examples/spatial_sharding_demo.py", [])
    out = capsys.readouterr().out
    assert "PartitionSpec('env', 'x')" in out
    assert "mean return" in out


def test_ns_precision_ladder_smoke(capsys):
    # tiny grid/steps: interpret-mode kernels on CPU; checks the ladder
    # prints all three modes and the reduced-precision drifts are nonzero
    _run("examples/ns_precision_ladder.py",
         ["--envs", "2", "--n", "16", "--steps", "3"])
    out = capsys.readouterr().out
    import re

    drifts = {}
    for line in out.splitlines():
        m = re.search(r"spectral_precision=(\w+)\s.*drift vs highest: "
                      r"([0-9.e+-]+)", line)
        if m:
            drifts[m.group(1)] = float(m.group(2))
    assert set(drifts) == {"highest", "high", "default"}
    assert drifts["highest"] == 0.0
    # the knobs actually change the arithmetic, and "high" is tighter
    assert 0.0 < drifts["high"] < drifts["default"]
