"""End-to-end train-step tests on tiny shapes over the 8-device CPU mesh.

SURVEY.md §4: 'a tiny-synthetic end-to-end train step (loss decreases,
only LoRA params update during warm-up)'.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from endodav_tpu.train import optim as O
from endodav_tpu.train.trainer import MAIN_COMPONENTS, Trainer, _flatten_bt

RNG = np.random.default_rng(314)


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
    warm_up_step = 5
    tune_depth_interval = -1
    temporal_lora = False
    tune_temporal_interval = 100
    tune_spatial_interval = 300
    disable_residual_block = False
    disable_conv_head = False
    residual_block_indexes = [1]
    include_cls_token = True
    learn_intrinsics = True
    model_type = "endodav"
    num_layers = 18
    height = 32
    width = 64
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
    batch_size = 4
    T = 2
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
    model_type = "endodav"
    depth_align = "scale_shift"
    pred_depth_scale_factor = 1.0
    chunk_windows = 1
    compute_dtype = "float32"
    depth_image_shape = (28, 42)
    eval_split = "scared_video"
    mesh_shape = "data=2"


def make_batch(opt):
    """Loader-shaped batch: [B, T, ...] per key (flattened by the step)."""
    b, t = opt.batch_size, opt.T
    batch = {}
    for fi in (0, -1, 1):
        for s in range(4):
            h, w = opt.height // 2 ** s, opt.width // 2 ** s
            arr = RNG.uniform(0.1, 0.9, (b, t, h, w, 3)).astype(np.float32)
            batch[("color", fi, s)] = arr
            batch[("color_aug", fi, s)] = arr + RNG.normal(0, 0.01, arr.shape).astype(np.float32)
    for s in range(4):
        from endodav_tpu.data.pipeline import scaled_intrinsics

        K, iK = scaled_intrinsics(opt.width, opt.height, s)
        batch[("K", s)] = np.broadcast_to(K, (b, t, 4, 4)).copy()
        batch[("inv_K", s)] = np.broadcast_to(iK, (b, t, 4, 4)).copy()
    return batch


@pytest.fixture(scope="module")
def trainer():
    opt = Opts()
    import tempfile

    opt.log_dir = tempfile.mkdtemp()
    return Trainer(opt)


@pytest.mark.slow
def test_train_step_runs_and_updates_right_params(trainer):
    t = trainer
    batch = make_batch(t.opt)

    before = {
        "lora": np.asarray(flatten_dict(t.main_params["depth_model"])[
            ("pretrained", "blocks_0", "mlp", "fc1", "lora_B")
        ]).copy(),
        "base": np.asarray(flatten_dict(t.main_params["depth_model"])[
            ("pretrained", "blocks_0", "mlp", "fc1", "kernel")
        ]).copy(),
        "pose": np.asarray(flatten_dict(t.main_params["pose"])[("pose_2", "kernel")]).copy(),
        "pos": np.asarray(flatten_dict(t.pos_params["position"])[
            ("position_conv_0", "kernel")
        ]).copy(),
        "convdepth": np.asarray(flatten_dict(t.main_params["depth_model"])[
            ("head", "conv_depth_1", "conv0", "kernel")
        ]).copy(),
        "motion": np.asarray(flatten_dict(t.main_params["depth_model"])[
            ("head", "motion_modules_0", "proj_in", "kernel")
        ]).copy(),
    }
    scalars = t.train_one_batch(batch)
    assert np.isfinite(float(scalars["loss"]))
    assert np.isfinite(float(scalars["loss_0"]))

    after_dm = flatten_dict(t.main_params["depth_model"])
    # warm-up: LoRA B trains (A's grad is zero at init since B is zero-init,
    # exactly as in torch LoRA)
    assert not np.allclose(before["lora"], np.asarray(after_dm[("pretrained", "blocks_0", "mlp", "fc1", "lora_B")]))
    # frozen ViT base does not
    np.testing.assert_array_equal(before["base"], np.asarray(after_dm[("pretrained", "blocks_0", "mlp", "fc1", "kernel")]))
    # conv_depth heads train
    assert not np.allclose(before["convdepth"], np.asarray(after_dm[("head", "conv_depth_1", "conv0", "kernel")]))
    # motion modules frozen without temporal_lora
    np.testing.assert_array_equal(before["motion"], np.asarray(after_dm[("head", "motion_modules_0", "proj_in", "kernel")]))
    # pose decoder trains
    assert not np.allclose(before["pose"], np.asarray(flatten_dict(t.main_params["pose"])[("pose_2", "kernel")]))
    # position decoder trains in phase 0
    assert not np.allclose(before["pos"], np.asarray(flatten_dict(t.pos_params["position"])[("position_conv_0", "kernel")]))


@pytest.mark.slow
def test_loss_decreases_over_steps(trainer):
    t = trainer
    batch = make_batch(t.opt)
    first = float(t.train_one_batch(batch)["loss"])
    for _ in range(4):
        last = float(t.train_one_batch(batch)["loss"])
    assert np.isfinite(last)
    assert last < first * 1.5  # no blow-up on repeated overfit steps


def test_schedule_gates_dvlora_switch():
    cfg = dict(lora_type="dvlora", warm_up_step=10, tune_depth_interval=-1,
               temporal_lora=True, tune_spatial_interval=3, tune_temporal_interval=2,
               train_output_conv=False)
    g_early = jax.tree_util.tree_map(float, O.schedule_gates(jnp.asarray(5), cfg))
    g_late = jax.tree_util.tree_map(float, O.schedule_gates(jnp.asarray(11), cfg))
    assert g_early["spatial_ab"] == 1.0 and g_early["spatial_uv"] == 0.0
    assert g_late["spatial_ab"] == 0.0 and g_late["spatial_uv"] == 1.0
    # spatial/temporal alternation: steps 0,1,2 spatial; 3,4 temporal (mod 5)
    g_sp = O.schedule_gates(jnp.asarray(1), cfg)
    g_tm = O.schedule_gates(jnp.asarray(4), cfg)
    assert float(g_sp["tune_temporal"]) == 0.0
    assert float(g_tm["tune_temporal"]) == 1.0
    assert float(g_tm["temporal_ab"]) == 1.0


def test_gated_adam_freezes_state():
    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    grads = {"a": jnp.full((3,), 0.5), "b": jnp.full((3,), 0.5)}
    state = O.init_adam(params)
    gates = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.0)}
    new_p, new_s = O.gated_adam_update(grads, state, params, 1e-2, gates)
    assert not np.allclose(np.asarray(new_p["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_p["b"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_s["mu"]["b"]), 0.0)
    assert float(new_s["count"]["a"]) == 1.0 and float(new_s["count"]["b"]) == 0.0


def test_assign_groups_labels():
    params = {
        "depth_model": {
            "pretrained": {"blocks_0": {"mlp": {"fc1": {"kernel": 0, "lora_A": 0, "lora_U": 0}}}},
            "head": {
                "conv_depth_1": {"conv0": {"kernel": 0}},
                "motion_modules_0": {"transformer_blocks_0": {"ff": {"proj_out": {"lora_A": 0, "kernel": 0}}}},
            },
        },
        "pose": {"pose_0": {"kernel": 0}},
    }
    g = O.assign_groups(params)
    dm = g["depth_model"]
    assert dm["pretrained"]["blocks_0"]["mlp"]["fc1"]["kernel"] == "frozen"
    assert dm["pretrained"]["blocks_0"]["mlp"]["fc1"]["lora_A"] == "spatial_ab"
    assert dm["pretrained"]["blocks_0"]["mlp"]["fc1"]["lora_U"] == "spatial_uv"
    assert dm["head"]["conv_depth_1"]["conv0"]["kernel"] == "adapt"
    assert dm["head"]["motion_modules_0"]["transformer_blocks_0"]["ff"]["proj_out"]["lora_A"] == "temporal_ab"
    assert dm["head"]["motion_modules_0"]["transformer_blocks_0"]["ff"]["proj_out"]["kernel"] == "frozen"
    assert g["pose"]["pose_0"]["kernel"] == "pose"


@pytest.mark.slow
def test_save_and_load_roundtrip(trainer):
    import os

    from flax.traverse_util import flatten_dict

    from endodav_tpu.utils import checkpoint as ckpt

    t = trainer
    t.epoch = 1
    t.save_model(mode="last")
    folder = os.path.join(t.log_path, "models", "weights_last")
    assert os.path.exists(os.path.join(folder, "depth_model.msgpack"))
    assert os.path.exists(os.path.join(folder, "adam.msgpack"))
    meta = ckpt.load_metadata(os.path.join(folder, "depth_model.msgpack"))
    assert meta["height"] == t.opt.height and meta["width"] == t.opt.width

    loaded = ckpt.load_components(folder, t.variables, names=["depth_model", "pose"])
    for k, v in flatten_dict(loaded["depth_model"]["params"]).items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flatten_dict(t.variables["depth_model"]["params"])[k])
        )


@pytest.mark.slow
def test_dash_phase_boundary_swaps_step():
    """The dash warmup boundary runs the SVD update and recompiles the
    step with phase 2 enabled (no full step execution needed)."""
    import tempfile

    opt = Opts()
    opt.log_dir = tempfile.mkdtemp()
    opt.lora_type = "dash"
    t = Trainer(opt)
    t.dash_warmup = 3
    t.step = 2
    t._maybe_dash_phase_boundary()
    assert not t.dash_phase2
    fn_before = t._step_fn
    t.step = 3
    t._maybe_dash_phase_boundary()
    assert t.dash_phase2
    assert t._step_fn is not fn_before
    u = np.asarray(
        flatten_dict(t.variables["depth_model"]["params"])[
            ("pretrained", "blocks_0", "mlp", "fc1", "weight_u_top")
        ]
    )
    assert np.abs(u).sum() > 0  # SVD populated the top directions
    # idempotent: calling again does nothing
    fn_after = t._step_fn
    t._maybe_dash_phase_boundary()
    assert t._step_fn is fn_after


@pytest.mark.slow
def test_val_ncc_runs(trainer):
    t = trainer
    batch = make_batch(t.opt)
    t.val_loader = [batch]  # anything iterable
    t.val_iter = iter(t.val_loader)
    score = t.val()
    assert score is not None and np.isfinite(score)


def test_legacy_frozen_groups_zero_their_gates():
    """--legacy_frozen_groups reproduces the reference's literal optimizer
    membership: post-warm-up U/V (and temporal-LoRA) updates are zero
    because its Adam never registered them (trainer:80)."""
    cfg = dict(lora_type="dvlora", warm_up_step=10, tune_depth_interval=-1,
               temporal_lora=True, tune_spatial_interval=3, tune_temporal_interval=2,
               train_output_conv=False, legacy_frozen_groups=O.LEGACY_FROZEN_GROUPS)
    # post-warm-up, spatial phase: the intended schedule would train
    # spatial_uv, the legacy mode must not
    g = jax.tree_util.tree_map(float, O.schedule_gates(jnp.asarray(11), cfg))
    assert g["spatial_ab"] == 0.0 and g["spatial_uv"] == 0.0
    # temporal phase (step 13: 13 % 5 = 3 >= spatial interval)
    g_t = jax.tree_util.tree_map(float, O.schedule_gates(jnp.asarray(13), cfg))
    assert g_t["temporal_ab"] == 0.0 and g_t["temporal_uv"] == 0.0
    # the loss-side temporal gate still flips (the reference flag does too)
    assert float(g_t["tune_temporal"]) == 1.0
    # 'adapt' (residual_/conv_depth_) stays registered and trains
    g_s = jax.tree_util.tree_map(float, O.schedule_gates(jnp.asarray(11), cfg))
    assert g_s["adapt"] == 1.0


def test_unrunnable_pose_model_types_rejected():
    """posecnn/shared/pose_model_input=all crash the reference video
    trainer before the first step; build_models rejects them loudly
    instead of silently ignoring the flag."""
    from endodav_tpu.train.trainer import build_models

    opt = Opts()
    opt.pose_model_type = "posecnn"
    with pytest.raises(ValueError, match="pose_model_type"):
        build_models(opt)
    opt.pose_model_type = "shared"
    with pytest.raises(ValueError, match="pose_model_type"):
        build_models(opt)
    opt.pose_model_type = "separate_resnet"
    opt.pose_model_input = "all"
    with pytest.raises(ValueError, match="pose_model_input"):
        build_models(opt)


@pytest.mark.slow
def test_dp_sharded_loss_matches_single_device():
    """The same global batch through the data=4 sharded step must produce
    the data=1 loss (round-3 VERDICT task 8; the DP curve lives in
    tools/bench_dp_scaling.py + PERFORMANCE.md)."""
    import sys

    sys.path.insert(0, ".")
    from tools.bench_dp_scaling import run_one

    l1, _ = run_one(1, 1)
    l4, _ = run_one(4, 1)
    assert abs(l1 - l4) < 1e-4, (l1, l4)
