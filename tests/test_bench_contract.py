"""bench.py robustness contract (VERDICT r4 ask #1).

Rounds 3 and 4 both produced empty rc-124 judged artifacts, each from a
hang UPSTREAM of the machinery the previous round's tests pinned (r3: a
probe/retry budget exceeding the driver window; r4:
``setup_compilation_cache()`` device-initing the parent process before
the probe). These tests pin the path TO the probe and the absolute
watchdog, not just the probe itself:

  * the pre-probe path must be backend-init-free — enforced with a
    sitecustomize poison that makes ANY backend init hang, the exact
    failure mode of a down axon tunnel;
  * a wall-clock watchdog armed at t=0 must turn any unforeseen hang
    into exit 2 with the hung phase named (or exit 0 if the JSON line
    already shipped).

All tests drive subprocesses: the watchdog uses ``os._exit`` and the
poison must apply at interpreter startup, neither of which can run
in-process under pytest.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Makes every backend-init entry point hang for 120 s — the down-tunnel
# failure mode (PJRT init hangs, no error). Gated by an env var so only
# subprocesses opted into the poison are affected.
_POISON = """\
import os
if os.environ.get("GENOMAX_TEST_HANG_BACKEND"):
    import time
    import jax
    from jax._src import xla_bridge

    def _hang(*a, **k):
        time.sleep(120)
        raise RuntimeError("hung backend (test poison)")

    xla_bridge.backends = _hang
    xla_bridge.get_backend = _hang
    xla_bridge._get_backend_uncached = _hang
    jax.default_backend = _hang
    jax.devices = _hang
"""


def _run(cmd, env, timeout):
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       env=env, timeout=timeout)
    return r, time.time() - t0


def test_bench_pre_probe_path_is_backend_free(tmp_path):
    """With EVERY backend-init entry point hung (the down-tunnel mode),
    bench.py must still reach the probe, time it out, and refuse with
    exit 2 — fast. The r4 bug (a jax.default_backend() call before the
    probe) hangs the parent in phase 'startup' instead and fails this
    test; verified against the poisoned setup_compilation_cache()."""
    (tmp_path / "sitecustomize.py").write_text(_POISON)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "GENOMAX_BENCH_TINY")}
    env.update(
        PYTHONPATH=str(tmp_path) + os.pathsep + env.get("PYTHONPATH", ""),
        GENOMAX_TEST_HANG_BACKEND="1",
        GENOMAX_PROBE_TIMEOUT="8",
        GENOMAX_BENCH_DEADLINE="240",
    )
    r, dt = _run([sys.executable, "bench.py"], env, timeout=200)
    assert r.returncode == 2, (r.returncode, r.stderr[-800:])
    assert "phase: tpu probe" in r.stderr
    assert "TPU probe timed out" in r.stderr
    assert "refusing to emit a CPU-backed number" in r.stderr
    # The refusal (not the watchdog) must be what fired: the watchdog
    # firing would mean the parent hung somewhere before the probe.
    assert "watchdog" not in r.stderr, r.stderr[-800:]
    assert r.stdout.strip() == ""  # no JSON line, nothing else either
    # Probe at 8 s + two interpreter startups (sitecustomize imports
    # jax); a pre-probe backend touch would instead burn the full 120 s
    # poison sleep.
    assert dt < 110, f"refusal took {dt:.0f}s — something pre-probe hung"


def test_bench_watchdog_exits_2_before_json(tmp_path):
    """The absolute deadline turns any unforeseen pre-JSON hang into
    exit 2 naming the hung phase (VERDICT r4 weak #2: two rounds, two
    different pre-refusal hangs, both rc-124 with nothing)."""
    code = (
        "import time\n"
        "import bench\n"
        "bench._DEADLINE_S = 1.0\n"
        "bench.phase('simulated hang')\n"
        "bench._start_watchdog()\n"
        "time.sleep(60)\n"
    )
    r, dt = _run([sys.executable, "-c", code], dict(os.environ), timeout=60)
    assert r.returncode == 2, (r.returncode, r.stderr[-500:])
    assert "bench watchdog" in r.stderr
    assert "simulated hang" in r.stderr
    assert dt < 30


def test_bench_watchdog_exits_0_after_json():
    """Once the JSON line is out the headline contract is satisfied: a
    hang in a secondary point forfeits only the secondaries (exit 0)."""
    code = (
        "import time\n"
        "import bench\n"
        "bench._DEADLINE_S = 1.0\n"
        "bench._JSON_EMITTED = True\n"
        "bench._start_watchdog()\n"
        "time.sleep(60)\n"
    )
    r, dt = _run([sys.executable, "-c", code], dict(os.environ), timeout=60)
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
    assert "secondaries forfeited" in r.stderr
    assert dt < 30


def test_probe_init_error_tail_reaches_detail(monkeypatch):
    """VERDICT r4 ask #7: the tunnel's CURRENT failure mode is a fast
    UNAVAILABLE error (not a hang), so probe_tpu's rc!=0 branch is the
    common path. A child dying with a multi-line traceback must land
    its last lines in ``detail`` — the only diagnostic the judged
    artifact's tail gets."""
    import genomax.testing.probe as probe_mod

    monkeypatch.setattr(
        probe_mod, "_CHILD",
        "import sys\n"
        "sys.stderr.write('Traceback (most recent call last):\\n'\n"
        "    '  File \"fake.py\", line 1, in <module>\\n'\n"
        "    'RuntimeError: Unable to initialize backend \\'axon\\': '\n"
        "    'UNAVAILABLE: TPU backend setup/compile error\\n')\n"
        "sys.exit(1)\n",
    )
    msgs = []
    ok, detail = probe_mod.probe_tpu(30, log=msgs.append)
    assert not ok
    assert "rc=1" in detail
    assert "UNAVAILABLE: TPU backend setup/compile error" in detail
    assert "device init error" in detail
