"""Checkpoint / resume.

The reference restarts only from xyz snapshots (`restart = 1` +
`restart_xyz_file`, input_parser.cpp:25-31, kmc_main.cpp:128-148) and LOSES
RNG state, in-bias kmc_time, temperature and field vectors across restarts
(SURVEY.md §5). Both styles are supported here:

  * xyz restart — byte-compatible with the reference's snapshots;
  * full checkpoint (npz) — captures EVERYTHING: element/charge/fields,
    T_bg, kmc_time, bias index, superstep count, and the exact mt19937
    positions of both RNG streams, so a resumed run is bit-identical to an
    uninterrupted one.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from akmc_tpu.rng import MT19937, BufferedStream, ReferenceRNG
from akmc_tpu.state import DeviceState


def save_checkpoint(
    path: str,
    state: DeviceState,
    kmc_stream: BufferedStream,
    device_rng: Optional[ReferenceRNG] = None,
    vt_counter: int = 0,
    kmc_step_count: int = 0,
    extra: Optional[dict] = None,
) -> None:
    rng = kmc_stream._rng._mt
    payload = dict(
        element=np.asarray(state.element),
        charge=np.asarray(state.charge),
        potential_boundary=np.asarray(state.potential_boundary),
        potential_charge=np.asarray(state.potential_charge),
        power=np.asarray(state.power),
        temperature=np.asarray(state.temperature),
        cb_edge=np.asarray(state.cb_edge),
        T_bg=np.asarray(state.T_bg),
        kmc_time=np.asarray(state.kmc_time),
        kmc_mt_state=rng.mt.copy(),
        kmc_mt_pos=np.asarray(rng.mti),
        kmc_buf=kmc_stream._buf.copy(),
        vt_counter=np.asarray(vt_counter),
        kmc_step_count=np.asarray(kmc_step_count),
        meta=np.frombuffer(
            json.dumps(extra or {}).encode(), dtype=np.uint8
        ),
    )
    if device_rng is not None:
        payload["dev_mt_state"] = device_rng._mt.mt.copy()
        payload["dev_mt_pos"] = np.asarray(device_rng._mt.mti)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str):
    """Returns (state, kmc_stream, vt_counter, kmc_step_count, extra)."""
    import jax.numpy as jnp

    d = np.load(path, allow_pickle=False)
    state = DeviceState(
        element=jnp.asarray(d["element"]),
        charge=jnp.asarray(d["charge"]),
        potential_boundary=jnp.asarray(d["potential_boundary"]),
        potential_charge=jnp.asarray(d["potential_charge"]),
        power=jnp.asarray(d["power"]),
        temperature=jnp.asarray(d["temperature"]),
        cb_edge=jnp.asarray(d["cb_edge"]),
        T_bg=jnp.asarray(d["T_bg"]),
        kmc_time=jnp.asarray(d["kmc_time"]),
    )
    rng = ReferenceRNG.__new__(ReferenceRNG)
    mt = MT19937.__new__(MT19937)
    mt.mt = d["kmc_mt_state"].copy()
    mt.mti = int(d["kmc_mt_pos"])
    rng._mt = mt
    stream = BufferedStream(rng)
    stream._buf = d["kmc_buf"].copy()
    extra = json.loads(bytes(d["meta"]).decode() or "{}")
    return state, stream, int(d["vt_counter"]), int(d["kmc_step_count"]), extra
