"""The ONE blessed TPU-reachability probe (VERDICT r3 ask #9).

Why this file exists: the axon-tunneled TPU fails by HANGING in PJRT
device init (no error, observed >240 s), and killing a probe process
mid-handshake can wedge the tunnel for 10-20 minutes — a watcher loop
doing rapid-fire timeout-kills once prolonged an outage for hours
(CLAUDE.md). Every place that needs a TPU verdict (bench.py, the
``genomax probe`` subcommand, hardware-session scripts) must go through
:func:`probe_tpu` so the hazard is encoded once:

  * exactly ONE attempt with long patience — no retry/sleep loops
    (retries that exceed the caller's watchdog window are dead code and
    each extra kill risks wedging the tunnel);
  * a heartbeat line is printed BEFORE the child starts, so a caller
    killed by an outer watchdog still leaves the cause in its tail;
  * on timeout the child is NOT killed: it is abandoned (detached
    session) and its pid reported.  An orphan that eventually finishes
    init runs one trivial op and exits (its BACKEND report lands on a
    pipe whose read end is gone — the print is wrapped in try/except so
    the orphan still exits cleanly instead of dying on EPIPE); an
    orphan that stays hung costs one idle process — both strictly
    better than a wedged tunnel.

The reference has no analogue (single local GPU, ``cudaSetDevice`` either
works or errors immediately, smithWaterman.cu:391-395); this is the tax
of the tunneled-device environment.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# Must exceed the measured HEALTHY cold-init ceiling (~290 s per-process
# plugin init on this tunnel, PERF.md §Compile latency: 22/33/153/288 s
# measured) or a slow-but-alive tunnel gets a false refusal. One attempt
# at 420 s fits the driver window fine — r3's failure was 3 attempts x
# 420 s + 2 x 240 s sleeps, not the single probe length.
DEFAULT_TIMEOUT_S = 420.0

# The child: init the backend, run one op, report the backend name.
# honor_jax_platforms first, so JAX_PLATFORMS=cpu callers get an honest
# "no TPU backend" verdict instead of a hung axon init. The BACKEND
# print tolerates OSError: an abandoned (timed-out) orphan inherits
# pipes whose read ends the caller has dropped, and the orphan's exit
# path must match the documented "runs one op and exits" contract
# rather than die on EPIPE (ADVICE r4).
_CHILD = """\
import genomax, sys
genomax.honor_jax_platforms()
import jax, jax.numpy as jnp
jnp.ones(8).block_until_ready()
b = jax.default_backend()
try:
    print('BACKEND=' + b, flush=True)
except OSError:
    pass  # abandoned orphan: caller gone; the verdict is moot anyway
sys.exit(0 if b != 'cpu' else 3)
"""


def probe_tpu(timeout_s: float = DEFAULT_TIMEOUT_S, *, log=None) -> tuple[bool, str]:
    """One long-patience TPU probe. Returns ``(ok, detail)``.

    ``ok`` is True iff a subprocess completed device init AND one op on a
    non-CPU backend within ``timeout_s``. A successful probe also warms
    the tunnel connection for the caller's own init. ``detail`` is a
    one-line human verdict either way.
    """
    if log is None:
        def log(msg):
            print(msg, file=sys.stderr, flush=True)

    log(f"TPU probe: single attempt, max {timeout_s:.0f}s "
        "(a down tunnel hangs device init; on timeout the child is "
        "abandoned, not killed — kills mid-handshake can wedge the tunnel)")
    t0 = time.time()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=repo, start_new_session=True,  # survives us; never signalled
    )
    try:
        out, err = child.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        detail = (f"TPU probe timed out after {time.time()-t0:.0f}s; "
                  f"device init is hung (tunnel down). Child pid "
                  f"{child.pid} left running unkilled on purpose.")
        log(detail)
        return False, detail
    dt = time.time() - t0
    backend = ""
    for line in (out or b"").decode(errors="replace").splitlines():
        if line.startswith("BACKEND="):
            backend = line[len("BACKEND="):].strip()
    if child.returncode == 0:
        detail = f"TPU probe OK: backend={backend or '?'} in {dt:.0f}s"
        log(detail)
        return True, detail
    if child.returncode == 3:
        detail = (f"TPU probe: backend resolved to CPU in {dt:.0f}s "
                  "(no TPU plugin, or JAX_PLATFORMS=cpu)")
    else:
        # Real init ERROR (vs hang): the cause must reach the caller's
        # tail — it is the only diagnostic bench.py leaves behind.
        tail = (err or b"").decode(errors="replace").strip()
        tail = " | ".join(tail.splitlines()[-3:])[-300:]
        detail = (f"TPU probe child exited rc={child.returncode} "
                  f"in {dt:.0f}s (device init error): {tail or 'no stderr'}")
    log(detail)
    return False, detail


def main(args) -> int:
    """`genomax probe` — print the verdict, exit 0 (reachable) / 2 (not)."""
    ok, _ = probe_tpu(args.timeout)
    return 0 if ok else 2
