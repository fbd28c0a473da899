"""Multi-host bring-up smoke: 2 REAL processes over the distributed runtime.

Exercises the code paths a TPU pod-slice launch would use — per-process
jax.distributed.initialize (parallel/mesh.py:initialize_distributed), a
hybrid DCN mesh built with process-granule placement (make_dcn_mesh), global
sharded batch construction, and one full data-parallel train step (loss ->
psum'd grads -> RAdam) — on the CPU backend (2 processes x 2 virtual
devices), which is the part of the >=85%-scaling gate that CAN be validated
without pod hardware (VERDICT r2 "what's missing" #6).

Usage:
    python -m hashnerf_tpu.tools.multihost_smoke            # parent: spawns 2
    (child mode is internal: MHS_CHILD=<pid> in the environment)

Parent writes MULTIHOST_SMOKE.json {ok, loss, n_processes, n_global_devices}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("MHS_PORT", "12355"))
N_PROC = 2
DEV_PER_PROC = 2


def child(proc_id: int):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from hashnerf_tpu.parallel.mesh import initialize_distributed, make_dcn_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == N_PROC * DEV_PER_PROC, n_global

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # hybrid mesh: DCN axis = processes, ICI axis = in-process devices
    mesh = make_dcn_mesh(N_PROC, model_per_host=1)
    assert mesh.shape == {"data": n_global, "model": 1}, mesh.shape

    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.config import config_parser
    from hashnerf_tpu.train.driver import make_loss_fn, make_optimizer, \
        model_config_from_args, render_config_from_args
    from hashnerf_tpu.models.factory import create_model

    args = config_parser().parse_args([])
    args.N_rand = 32
    args.N_samples = 8
    args.N_importance = 8
    args.finest_res = 32
    args.log2_hashmap_size = 10
    args.use_viewdirs = True
    args.lrate = 0.01

    model_cfg = model_config_from_args(args)
    render_cfg = render_config_from_args(args)
    state, query_fn = create_model(jax.random.PRNGKey(0), model_cfg)
    optimizer = make_optimizer(args, state)
    opt_state = optimizer.init(state)
    bbox = jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], jnp.float32)
    loss_fn = make_loss_fn(args, render_cfg, query_fn, bbox, model_cfg.hash_grid)

    # identical global batch on every process (same seed); shard over 'data'
    rng = np.random.default_rng(0)
    R = args.N_rand
    o = np.zeros((R, 3), np.float32) + np.array([0, 0, 4], np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    host_batch = {
        "rays_o": o, "rays_d": d, "viewdirs": d,
        "target": rng.uniform(size=(R, 3)).astype(np.float32),
        "near": np.full((R,), 2.0, np.float32),
        "far": np.full((R,), 6.0, np.float32),
    }
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def globalize(x, sh):
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: np.asarray(x[idx])
        )

    batch = {k: globalize(v, data_sh) for k, v in host_batch.items()}
    state = jax.tree_util.tree_map(lambda x: globalize(np.asarray(x), rep), state)
    opt_state = jax.tree_util.tree_map(
        lambda x: globalize(np.asarray(x), rep)
        if hasattr(x, "shape") else x,
        opt_state,
    )

    import optax

    @jax.jit
    def step(state, opt_state, batch, key):
        (loss, (psnr, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state, batch, key, jnp.float32(1e-6)
        )
        updates, opt_state = optimizer.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return state, opt_state, loss

    loss = None
    for i in range(2):
        state, opt_state, loss = step(
            state, opt_state, batch, jax.random.PRNGKey(i)
        )
    # the loss is fully replicated -> addressable (fetchable) on every process
    loss_v = float(loss)
    print(f"[child {proc_id}] global devices={n_global} loss={loss_v:.6f}", flush=True)
    if proc_id == 0:
        with open(os.path.join(REPO, "MULTIHOST_SMOKE.json"), "w") as f:
            json.dump(
                {
                    "ok": bool(np.isfinite(loss_v)),
                    "loss": loss_v,
                    "n_processes": N_PROC,
                    "n_global_devices": n_global,
                    "mesh": {k: int(v) for k, v in mesh.shape.items()},
                },
                f, indent=1,
            )
    jax.distributed.shutdown()


def parent():
    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    flags = env_base.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env_base["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        ).strip()
    procs = []
    for i in range(N_PROC):
        env = dict(env_base)
        env["MHS_CHILD"] = str(i)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "hashnerf_tpu.tools.multihost_smoke"],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        print(f"--- process {i} (rc={p.returncode}) ---\n{out}", flush=True)
        ok = ok and p.returncode == 0
    if not ok:
        print("MULTIHOST SMOKE FAILED", flush=True)
        sys.exit(1)
    print("MULTIHOST SMOKE OK", flush=True)


if __name__ == "__main__":
    if "MHS_CHILD" in os.environ:
        child(int(os.environ["MHS_CHILD"]))
    else:
        parent()
