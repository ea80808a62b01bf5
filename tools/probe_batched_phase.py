"""Per-phase attribution of the batched event loop at crossbar scale —
VERDICT r4 weak #1: ~3 s of the 4.37 s crossbar superstep is unattributed
(suspect: the ~1,000 batched-loop iterations at ~3-4 ms each).

Phases, chained K batches in one jit (forced-pull brackets; per-dispatch
overhead ~90 ms >> device work on this runtime). Every big array is a jit
ARGUMENT (closed-over constants bake into the HLO — the remote compiler
rejects the multi-GB request with HTTP 413, and baked constants are ~600x
slower per call anyway):

  clk    — per-row clocks: u ~ U(n), tau = -ln(u)/R, total = sum(R)
  +topk  — + _topk_smallest(tau, B) (two-stage block top-k)
  +cand  — + candidate row/slot gathers, touched-row set (ar_b), conflict
           matrix, killed-mass bound (incl. the (B, 2+2NN, NN) ar_P gather)
  full   — the real run_event_loop_batched body, forced to exactly K
           batches (freq pinned so the termination gap never fires)

Differences attribute each phase; full - (clk+topk+cand) ~= execute +
zero-out scatters.

Usage: python tools/probe_batched_phase.py [n_yz] [B] [K] [reps]
Reference law being batched: kmc_events.cu:448-516.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jaxcache")
import jax.numpy as jnp
import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_yz = int(args[0]) if len(args) > 0 else 215
    B = int(args[1]) if len(args) > 1 else 64
    K = int(args[2]) if len(args) > 2 else 50
    reps = int(args[3]) if len(args) > 3 else 5

    from akmc_tpu.models.crossbar import build_grid_crossbar
    from akmc_tpu.models.vcm import VCMModel
    from akmc_tpu.state import make_device_state

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.perf_counter()
    p, lat = build_grid_crossbar(
        n_yz=n_yz, contact_slices=10, oxide_slices=22, ti_slices=8,
        defect_fraction=0.1, vacancy_concentration=0.05, seed=0,
        cache_dir=os.path.join(here, ".cache"),
    )
    model = VCMModel(p, lat, rate_normalize=True, pair_f32=True)
    state = make_device_state(lat, p.background_temp)
    print(f"[build] N={lat.N} in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    Vd = 15.0

    @jax.jit
    def fields(t, kop, element, charge, pb, T_bg):
        fr = model._fields(t, kop, element, charge, pb, T_bg, Vd)
        P, etype, neigh, zrows = model._loop_arrays(t, fr.P, fr.etype)
        return P, etype, neigh, fr.ln_S, fr.charge

    t0 = time.perf_counter()
    P, etype, neigh, ln_S, charge = fields(
        model.tables, model.kop, state.element, state.charge,
        state.potential_boundary, state.T_bg,
    )
    _ = float(jnp.sum(P[0]))
    print(f"[fields] {time.perf_counter()-t0:.1f}s P={P.shape}",
          file=sys.stderr, flush=True)
    n, nn = P.shape
    R = jnp.sum(P, axis=1)
    element = state.element
    act_idx, abs2act = model.tables.act_idx, model.tables.abs2act

    from akmc_tpu.ops.events import _topk_smallest, run_event_loop_batched

    def bench(f, name, fargs, per=K):
        ts = []
        key = jax.random.PRNGKey(42)
        for i in range(reps):
            ki = jax.random.fold_in(key, i)
            tt = time.perf_counter()
            out = f(*fargs, ki)
            _ = float(np.asarray(out if not isinstance(out, tuple) else out[0]).ravel()[0])
            ts.append(time.perf_counter() - tt)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med/per*1e3:7.2f} ms/batch  ("
              + " ".join(f"{x*1e3:.0f}" for x in ts) + " ms)",
              file=sys.stderr, flush=True)
        return med / per * 1e3

    # --- clk ---
    def clk_chain(P_, R_, key0):
        def body(i, c):
            key, acc = c
            key, k1 = jax.random.split(key)
            u = jax.random.uniform(k1, (n,), dtype=P_.dtype)
            tau = -jnp.log(u) / R_
            total = jnp.sum(R_)
            return (key, acc + tau[i % n] + total * 0.0)
        _, acc = jax.lax.fori_loop(0, K, body, (key0, jnp.asarray(0.0)))
        return acc

    # --- clk + topk ---
    def topk_chain(P_, R_, key0):
        def body(i, c):
            key, acc = c
            key, k1 = jax.random.split(key)
            u = jax.random.uniform(k1, (n,), dtype=P_.dtype)
            tau = -jnp.log(u) / R_
            total = jnp.sum(R_)
            tau_b, rows_b = _topk_smallest(tau, B)
            return (key, acc + tau_b[0] + rows_b[0] * 0.0 + total * 0.0)
        _, acc = jax.lax.fori_loop(0, K, body, (key0, jnp.asarray(0.0)))
        return acc

    # --- clk + topk + candidate/conflict/mass (no state writes) ---
    def cand_chain(P_, R_, neigh_, act_idx_, abs2act_, key0):
        def body(i, c):
            key, acc = c
            key, k1, k2 = jax.random.split(key, 3)
            u = jax.random.uniform(k1, (n,), dtype=P_.dtype)
            tau = -jnp.log(u) / R_
            total = jnp.sum(R_)
            tau_b, rows_b = _topk_smallest(tau, B)
            rows_P = P_[rows_b]
            cumr = jnp.cumsum(rows_P, axis=1)
            rowtot = cumr[:, -1]
            t_slot = jax.random.uniform(k2, (B,), dtype=P_.dtype) * rowtot
            slot_b = jnp.clip(
                jnp.sum(cumr < t_slot[:, None], axis=1).astype(jnp.int32),
                0, nn - 1,
            )
            isel_b = act_idx_[rows_b].clip(0)
            jsel_b = neigh_[rows_b, slot_b].clip(0)
            jrow_b = abs2act_[jsel_b]
            ar_b = jnp.concatenate(
                [jnp.stack([rows_b, jrow_b], 1),
                 abs2act_[neigh_[rows_b].clip(0)],
                 abs2act_[neigh_[jrow_b].clip(0)]], axis=1)
            touch = jnp.any(rows_b[None, :, None] == ar_b[:, None, :], axis=2)
            lower = jnp.tril(jnp.ones((B, B), bool), k=-1)
            conflicted = jnp.any(touch.T & lower, axis=1)
            ar_P = P_[ar_b]
            ar_nbr = neigh_[ar_b]
            kill_b = (
                (ar_b == rows_b[:, None])[:, :, None]
                | (ar_b == jrow_b[:, None])[:, :, None]
                | (ar_nbr == isel_b[:, None, None])
                | (ar_nbr == jsel_b[:, None, None])
            )
            killed = jnp.sum(jnp.where(kill_b, ar_P, 0.0), axis=(1, 2))
            return (key, acc + killed[0] + conflicted[0] * 1.0
                    + tau_b[0] * 0.0 + total * 0.0)
        _, acc = jax.lax.fori_loop(0, K, body, (key0, jnp.asarray(0.0)))
        return acc

    # --- full body, exactly K batches (termination gap pinned off) ---
    def full_chain(element_, charge_, P_, etype_, neigh_, act_idx_,
                   abs2act_, ln_S_, key0):
        res = run_event_loop_batched(
            element_, charge_, P_, etype_, neigh_, key0,
            1e-30,                      # inv_freq = 1e30: gap test never fires
            batch=B, max_batches=K, act_idx=act_idx_, abs2act=abs2act_,
            ln_S=ln_S_, mass_eps=0.03,
        )
        return res.n_events.astype(jnp.float64)

    r_clk = bench(jax.jit(clk_chain), "clk        ", (P, R))
    r_topk = bench(jax.jit(topk_chain), "clk+topk   ", (P, R))
    r_cand = bench(jax.jit(cand_chain), "..+cand    ",
                   (P, R, neigh, act_idx, abs2act))
    r_full = bench(jax.jit(full_chain), "full body  ",
                   (element, charge, P, etype, neigh, act_idx, abs2act, ln_S))

    print(json.dumps({
        "n_rows": int(n), "nn": int(nn), "B": B, "K": K,
        "ms_clk": round(r_clk, 3),
        "ms_topk": round(r_topk - r_clk, 3),
        "ms_cand": round(r_cand - r_topk, 3),
        "ms_exec_zero": round(r_full - r_cand, 3),
        "ms_full_batch": round(r_full, 3),
    }))


if __name__ == "__main__":
    main()
