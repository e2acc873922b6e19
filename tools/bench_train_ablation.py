"""Where does the 3.1 s train step go?  Whole-piece ablation on TPU.

Builds the Trainer at the reference training config (B=1, T=16, 256x320,
vits @ 224x280, dvlora, bf16) and times, as separate jits with distinct
batches per iteration:

  full        the production two-phase step (trainer._build_step)
  phase0      position-nets value_and_grad + update only
  main_fwd    main_phase forward (depth+pose+losses), no grad
  main_grad   main_phase value_and_grad
  depth_fwd   depth model alone on the [B,T] video
  depth_grad  depth model fwd+bwd alone

Run: python tools/bench_train_ablation.py [--iters 4]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402


class Opts:
    data_path = "/nonexistent"
    log_dir = None
    encoder = "vits"
    pre_norm = False
    inv_sigmoid = False
    out_sigmoid = False
    pretrained_path = None
    lora_type = "dvlora"
    lora_rank = 4
    warm_up_step = 20000
    tune_depth_interval = -1
    temporal_lora = False
    tune_temporal_interval = 100
    tune_spatial_interval = 300
    disable_residual_block = True
    disable_conv_head = True
    residual_block_indexes = []
    include_cls_token = True
    learn_intrinsics = True
    model_type = "endodav"
    num_layers = 18
    height = 256
    width = 320
    depth_reproj = 0.01
    depth_flow = 0.01
    disparity_smoothness = 1e-3
    position_smoothness = 1e-3
    transform_constraint = 0.01
    transform_smoothness = 0.01
    scales = [0, 1, 2, 3]
    min_depth = 0.1
    max_depth = 150.0
    use_stereo = False
    frame_ids = [0, -1, 1]
    frame_max_interval = 1
    random_train = False
    train_output_conv = False
    batch_size = 1
    T = 16
    learning_rate = 1e-4
    num_epochs = 1
    scheduler_step_size = 10
    no_ssim = False
    weights_init = "scratch"
    pose_model_input = "pairs"
    pose_model_type = "separate_resnet"
    num_workers = 0
    load_weights_folder = None
    models_to_load = []
    log_frequency = 400
    depth_align = "scale_shift"
    pred_depth_scale_factor = 1.0
    chunk_windows = 1
    compute_dtype = "bfloat16"
    depth_image_shape = (224, 280)
    eval_split = "scared_video"
    mesh_shape = ""
    host_preprocess = True


def make_batches(opt, n, rng):
    from endodav_tpu.data.pipeline import scaled_intrinsics

    out = []
    for _ in range(n):
        b, t = opt.batch_size, opt.T
        batch = {}
        for fi in (0, -1, 1):
            for s in range(4):
                h, w = opt.height // 2 ** s, opt.width // 2 ** s
                arr = rng.uniform(0.1, 0.9, (b, t, h, w, 3)).astype(np.float32)
                batch[("color", fi, s)] = arr
                batch[("color_aug", fi, s)] = arr
        for s in range(4):
            K, iK = scaled_intrinsics(opt.width, opt.height, s)
            batch[("K", s)] = np.broadcast_to(K, (b, t, 4, 4)).copy()
            batch[("inv_K", s)] = np.broadcast_to(iK, (b, t, 4, 4)).copy()
        out.append(batch)
    return out


def timeit(fn, batches, iters):
    import jax

    device_sync(fn(batches[0]))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        device_sync(fn(batches[i + 1]))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.train import losses as L
    from endodav_tpu.train import optim as O
    from endodav_tpu.train.trainer import MAIN_COMPONENTS, POSITION_COMPONENTS, Trainer, _flatten_bt

    opt = Opts()
    opt.log_dir = tempfile.mkdtemp()
    tr = Trainer(opt)
    rng = np.random.default_rng(0)
    # one distinct batch per timed call (relay caching; PERFORMANCE.md)
    host_batches = make_batches(opt, args.iters + 1, rng)
    dev_batches = [jax.device_put(_flatten_bt(b)) for b in host_batches]
    device_sync(dev_batches)
    mods, variables = tr.mods, tr.variables
    cfg = tr.loss_cfg
    scales, hw = cfg["scales"], (cfg["height"], cfg["width"])

    results = {}

    def record(name, fn):
        try:
            results[name] = timeit(fn, dev_batches, args.iters)
            print(f"{name}: {results[name]*1e3:.0f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    step_fn = tr._step_fn if hasattr(tr, "_step_fn") else tr._build_step(False)

    # the step donates (variables, opt_state, opt_state_0); thread them
    # through iterations exactly like real training does.
    state = [tr.variables, tr.opt_state, tr.opt_state_0]

    def full(batch):
        v, s1, s0, scalars, _ = step_fn(
            state[0], state[1], state[2], dict(batch),
            jnp.asarray(0), jnp.asarray(1e-4), jnp.asarray(1e-4))
        state[0], state[1], state[2] = v, s1, s0
        return scalars["loss_0"]

    record("full step", full)
    variables = state[0]  # post-step params for the sub-pieces below
    dev_vars = variables  # already on device; passed as jit args so the
    # params travel as buffers, not HLO constants (a closed-over 100 MB
    # params tree blew the remote-compile request limit)

    pos_params = {k: variables[k]["params"] for k in POSITION_COMPONENTS}
    main_params = {k: variables[k]["params"] for k in MAIN_COMPONENTS}

    @jax.jit
    def phase0_impl(variables, pos_params, batch):
        def loss0(pp):
            v = dict(variables)
            v["position_encoder"] = {"params": pp["position_encoder"],
                                     "batch_stats": variables["position_encoder"]["batch_stats"]}
            v["position"] = {"params": pp["position"]}
            outputs, stats = L.forward_flow_nets(mods, v, batch, scales, hw,
                                                 train_position=True, train_transform=False)
            return L.position_phase_loss(outputs, batch, scales,
                                         cfg["position_smoothness"]), stats

        (l0, _), g = jax.value_and_grad(loss0, has_aux=True)(pos_params)
        return l0, jax.tree_util.tree_map(lambda a: a.sum(), g)

    record("phase0 grad", lambda b: phase0_impl(dev_vars, pos_params, b))

    @jax.jit
    def main_fwd_impl(variables, batch):
        loss, aux = L.main_phase(mods, variables, batch, cfg)
        return loss

    record("main_phase fwd", lambda b: main_fwd_impl(dev_vars, b))

    @jax.jit
    def main_grad_impl(variables, main_params, batch):
        def lm(mp):
            v = dict(variables)
            for k in MAIN_COMPONENTS:
                v[k] = dict(variables[k])
                v[k]["params"] = mp[k]
            loss, aux = L.main_phase(mods, v, batch, cfg)
            return loss

        l, g = jax.value_and_grad(lm)(main_params)
        return l, jax.tree_util.tree_map(lambda a: a.sum(), g)

    record("main_phase grad", lambda b: main_grad_impl(dev_vars, main_params, b))

    @jax.jit
    def depth_fwd_impl(dm_vars, batch):
        video = batch[("color_aug", 0, 0)].reshape(
            opt.batch_size, opt.T, opt.height, opt.width, 3)
        out = mods["depth_model"].apply(dm_vars, video, train=True)
        return out[("disp", 0)].astype(jnp.float32).mean()

    record("depth model fwd", lambda b: depth_fwd_impl(dev_vars["depth_model"], b))

    @jax.jit
    def depth_grad_impl(dm_vars, batch):
        def ld(p):
            video = batch[("color_aug", 0, 0)].reshape(
                opt.batch_size, opt.T, opt.height, opt.width, 3)
            v = dict(dm_vars)
            v["params"] = p
            out = mods["depth_model"].apply(v, video, train=True)
            return (out[("disp", 0)].astype(jnp.float32) ** 2).mean()

        l, g = jax.value_and_grad(ld)(dm_vars["params"])
        return l, jax.tree_util.tree_map(lambda a: a.sum(), g)

    record("depth model grad", lambda b: depth_grad_impl(dev_vars["depth_model"], b))

    # ---- ground truth: device-side executable durations from the
    # profiler (tools/profile_device.py) — the only timing path this
    # environment reports faithfully.
    try:
        from tools.profile_device import device_profile

        def run_profiled():
            out = None
            for i in range(3):
                out = full(dev_batches[min(i, len(dev_batches) - 1)])
            return out

        rows = device_profile(run_profiled)
        print("\n--- device-side profile of 3 full steps (top executables) ---")
        for name, n, ms in rows[:12]:
            print(f"{name}: n={n} total={ms:.2f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"device profile FAILED: {type(e).__name__}: {e}", flush=True)

    print("\n=== train-step ablation (median of %d) ===" % args.iters)
    for k, v in results.items():
        print(f"{k}: {v*1e3:.0f} ms")


if __name__ == "__main__":
    main()
