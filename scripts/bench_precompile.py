"""Do concurrent remote XLA compiles overlap on this TPU tunnel?

The cold-calibration residual (E2E_RUN.md round-3 table: 20m10s vs the
15-min target) is ~30 genuinely-distinct serialized remote compiles.
CalibConfig.precompile > 1 issues Lowered.compile() calls from N
threads; whether that helps depends entirely on whether the remote
compile server runs them concurrently. Round-2's pipelining experiment
measured compile/EXECUTE contention (2.5x slower); compile/COMPILE
overlap is a different question and was unmeasured until this script.

Method: lower K structurally-distinct programs (dense chains with unique
widths so neither local dedup nor the server cache can coalesce them),
then time `compile()` either serially or on a thread pool. Distinct
widths per mode so the serial run cannot warm the threaded run.

Usage: python scripts/bench_precompile.py [K] [THREADS]
  runs the serial baseline then the threaded run, prints both.
"""

import concurrent.futures as cf
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def make_lowered(width):
    """A compile-heavy program unique to `width`: an unrolled dense chain
    (32 layers) inside a fori_loop. Unrolling inflates the HLO so the
    remote compile takes seconds, like a recon runner."""

    def chain(x, ws):
        for w in ws:
            x = jnp.tanh(x @ w)
        return x

    @partial(jax.jit, static_argnums=())
    def run(x, ws):
        return jax.lax.fori_loop(0, 4, lambda i, x: chain(x, ws), x)

    x = jax.ShapeDtypeStruct((64, width), jnp.bfloat16)
    ws = [jax.ShapeDtypeStruct((width, width), jnp.bfloat16)
          for _ in range(32)]
    return run.lower(x, ws)


def run_mode(widths, threads):
    t0 = time.time()
    lowered = [make_lowered(w) for w in widths]
    t_lower = time.time() - t0
    t0 = time.time()

    def timed_compile(low):
        t1 = time.time()
        low.compile()
        return time.time() - t1

    if threads <= 1:
        per = [timed_compile(low) for low in lowered]
    else:
        with cf.ThreadPoolExecutor(max_workers=threads) as ex:
            per = [f.result()
                   for f in [ex.submit(timed_compile, low)
                             for low in lowered]]
    # per-compile times distinguish true overlap (wall << sum(per)) from
    # per-compile slowdown under contention (per grows with threads)
    print(f"  per-compile: {[f'{p:.1f}' for p in per]}", flush=True)
    return t_lower, time.time() - t0


def main():
    print(f"backend={jax.default_backend()} K={K} threads={THREADS}",
          flush=True)
    # warm the tunnel / process once so neither mode pays first-RPC cost
    jax.jit(lambda x: x + 1)(jnp.ones((8, 128))).block_until_ready()

    # interleave widths from ONE sequence so mean program size matches
    # across modes (identical widths would let the server cache coalesce)
    all_widths = [512 + 128 * i for i in range(2 * K)]
    serial_widths = all_widths[0::2]
    thread_widths = all_widths[1::2]

    t_lower, t_serial = run_mode(serial_widths, 1)
    print(f"serial:   lower {t_lower:.1f}s  compile {t_serial:.1f}s "
          f"({t_serial / K:.1f}s/program)", flush=True)
    t_lower, t_thread = run_mode(thread_widths, THREADS)
    print(f"threads={THREADS}: lower {t_lower:.1f}s  compile {t_thread:.1f}s "
          f"({t_thread / K:.1f}s/program)  speedup {t_serial / t_thread:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
