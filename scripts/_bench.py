"""Shared timing harness for the profiling scripts.

One methodology everywhere: the candidate op is repeated REPS times inside a
single jitted ``lax.scan`` (inputs perturbed per iteration by the caller to
defeat CSE) and the whole scan is timed with one sync — the remote-execution
runtime adds ~30ms of latency per dispatch, which would otherwise swamp
per-op numbers. Large operands must be passed via ``*ops`` (jit ARGUMENTS),
not closed over: captured arrays embed as HLO constants and can overflow the
remote-compile request (HTTP 413).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(name, body, *ops, reps=10):
    """body(carry, i, *ops) -> carry. Prints per-rep ms; returns it (or None
    on compile/run failure)."""
    @jax.jit
    def run(*ops_):
        def step(c, i):
            return body(c, i, *ops_), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(reps))
        return c

    try:
        np.asarray(run(*ops))
    except Exception as e:  # noqa: BLE001 - report and continue benchmarking
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    np.asarray(run(*ops))
    np.asarray(run(*ops))
    dt = (time.perf_counter() - t0) / 2
    print(f"{name:52s} {dt/reps*1e3:8.2f} ms/rep")
    return dt / reps
