"""Does a big f64 while_loop CARRY cost milliseconds at loop entry on this
runtime even when the body runs ZERO iterations?

tools/probe_events_5nm.py measured the 5 nm event loop's setup at
8.5 ms/step with zero body iterations; the loop carries the full
(21504, 52) f64 rate table (8.9 MB, dd-emulated).  This probe enters a
cond-false while_loop per scan step with

  big    carry = (P, R, cnt)      — the event-loop shape
  small  carry = (R, cnt), P read inside the body as a captured operand
  none   no while_loop at all     — scan baseline

    python tools/probe_while_carry.py [k] [reps]
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cache = os.path.join(here, ".cache", "jaxcache")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import numpy as np

    R_, NN = 21504, 52
    rng = np.random.default_rng(0)
    P0 = jnp.asarray(rng.random((R_, NN)))

    def variant(mode):
        def run(P, lim):
            def step(carry, i):
                P, acc = carry
                P = P + 1e-300 * i          # live chain, value-preserving
                R = jnp.sum(P, axis=1)

                if mode == "big":
                    def cond(c):
                        return c[2] < lim

                    def body(c):
                        Pb, Rb, cnt = c
                        site = cnt % R_
                        Pb = Pb.at[site].set(Pb[site] * 0.5)
                        Rb = Rb.at[site].set(jnp.sum(Pb[site]))
                        return (Pb, Rb, cnt + 1)

                    P2, R2, _ = jax.lax.while_loop(
                        cond, body, (P, R, jnp.asarray(0, jnp.int32))
                    )
                    out = jnp.sum(R2) + P2[0, 0]
                elif mode == "small":
                    def cond(c):
                        return c[1] < lim

                    def body(c):
                        Rb, cnt = c
                        site = cnt % R_
                        Rb = Rb.at[site].set(jnp.sum(P[site]) * 0.5)
                        return (Rb, cnt + 1)

                    R2, _ = jax.lax.while_loop(
                        cond, body, (R, jnp.asarray(0, jnp.int32))
                    )
                    out = jnp.sum(R2) + P[0, 0]
                else:
                    out = jnp.sum(R) + P[0, 0]
                return (P, acc + out), None

            (P, acc), _ = jax.lax.scan(
                step, (P, jnp.asarray(0.0)), jnp.arange(k)
            )
            return acc

        return jax.jit(run)

    for mode in ("none", "small", "big"):
        fn = variant(mode)
        times = []
        for r in range(reps + 1):
            t0 = time.perf_counter()
            _ = float(fn(P0 + r * 1e-9, jnp.asarray(0, jnp.int32)))
            dt = (time.perf_counter() - t0) / k
            if r:
                times.append(dt)
        print(f"{mode:6s} median {float(np.median(times))*1e3:7.3f} ms/step"
              f"  min {min(times)*1e3:7.3f}", flush=True)


if __name__ == "__main__":
    main()
