"""High-level training orchestration: the framework's `main()`.

Everything the reference's 490-line driver does (main.cu:319-807) —
model init, data load, traversal setup, the epoch/batch loop, loss
printing — plus everything it lacks: occupancy updates, eval/PSNR,
checkpointing/resume, metrics, render output (SURVEY §7.4).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tnerf.cameras import pixel_rays
from tnerf.config import Config
from tnerf.data.dataset import (
    ImageDataset,
    load_data,
    scene_llff_kwargs,
    scene_proc_kwargs,
    validate_scene_background,
)
from tnerf.eval import evaluate
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.occupancy import (
    OccupancyGridState,
    init_occupancy,
    occupancy_fraction,
    renderer_payload,
    update_occupancy,
)
from tnerf.parallel.mesh import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from tnerf.render.grid_renderer import make_grid_renderer
from tnerf.render.renderer import make_uniform_renderer
from tnerf.train import (
    PixelSampler,
    TrainState,
    create_optimizer,
    eval_params,
    init_train_state,
    make_train_step,
    pose_extra_params,
)
from tnerf.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from tnerf.utils.metrics import MetricsWriter, get_logger, maybe_profile


def build_field(cfg: Config) -> NeRFField:
    arch = "twobranch" if cfg.field_.encoding in ("hashgrid", "triplane", "cp") else "fused5d"
    return NeRFField(cfg.field_, cfg.grid, arch=arch)


def build_renderer(
    cfg: Config,
    field: NeRFField,
    compact: Optional[bool] = None,
    for_eval: bool = False,
):
    """Renderer per cfg.render.pipeline; `compact` overrides the config
    (training uses a dense variant while the occupancy grid is still
    dense, switching to the compacted variant once it has pruned —
    see run_training)."""
    if cfg.scene.white_background != cfg.render.white_background:
        raise ValueError(
            "scene.white_background and render.white_background disagree "
            f"({cfg.scene.white_background} vs {cfg.render.white_background}): "
            "GT pixels would be composited over a different background than "
            "the renderer adds — set both to the same value"
        )
    p = cfg.render.pipeline
    if cfg.sampler.placement != "uniform" and p not in ("grid_march", "fused"):
        raise ValueError(
            f"sampler.placement={cfg.sampler.placement!r} needs "
            f"render.pipeline='grid_march' or 'fused' (got {p!r}): "
            "grid_intervals places samples per traversal interval"
        )
    if cfg.sampler.placement == "density_cdf" and p == "fused":
        raise ValueError(
            "sampler.placement='density_cdf' is a grid_march quadrature: "
            "the fused kernel's CDF fold probes binary occupancy bins "
            "(occupancy_cdf); density-weighted placement needs the "
            "density-EMA probes of the march path"
        )
    if cfg.sampler.placement == "occupancy_cdf" and p == "fused" \
            and not cfg.render.fused_tighten:
        raise ValueError(
            "fused occupancy_cdf placement needs render.fused_tighten="
            "true (bin weights come from the tighten+sample-mask kernel)"
        )
    if p == "uniform":
        return make_uniform_renderer(field, cfg.sampler, cfg.render)
    do_compact = cfg.render.compact if compact is None else compact
    if p == "grid_march":
        return make_grid_renderer(
            field, cfg.grid, cfg.sampler, cfg.render,
            strategy="march", compact=do_compact,
            compact_fraction=cfg.render.compact_fraction,
        )
    if p == "grid_intervals":
        return make_grid_renderer(
            field, cfg.grid, cfg.sampler, cfg.render, strategy="intervals",
        )
    if p == "fused":
        # v2: trainable (custom-VJP backward kernel, packed-ray capable).
        # render.fused_rpc applies to eval/render builds;
        # render.fused_train_rpc to training builds (rpc=2 + S=64 fills
        # all 128 chunk lanes — ~2x train throughput, same quadrature).
        if cfg.field_.encoding != "frequency":
            raise ValueError(
                "render.pipeline=fused bakes the frequency encoding into "
                f"the kernel; field_.encoding={cfg.field_.encoding!r} needs "
                "render.pipeline=grid_march (hashgrid runs as MXU one-hot "
                "matmuls there — see configs/procedural_hard_hashgrid.json)"
            )
        if cfg.field_.view_encoding != "frequency":
            raise ValueError(
                "render.pipeline=fused bakes the frequency VIEW encoding "
                "into the kernel (gamma/beta algebra); "
                f"field_.view_encoding={cfg.field_.view_encoding!r} needs "
                "render.pipeline=grid_march"
            )
        from tnerf.render.pallas_fused2 import make_fused_pipeline_renderer_v2

        return make_fused_pipeline_renderer_v2(
            cfg.field_, cfg.grid, cfg.sampler, cfg.render,
            interpret=jax.devices()[0].platform != "tpu",
            rpc=cfg.render.fused_rpc if for_eval else cfg.render.fused_train_rpc,
            tighten=cfg.render.fused_tighten,
            ray_compact=cfg.render.ray_compact and for_eval,
        )
    raise ValueError(f"unknown render pipeline {p!r}")


def validate_ndc(cfg: Config) -> None:
    """scene.ndc preconditions, checked once up front (train + CLI):
    the warp projects along world -z from a recentered forward-facing
    capture, so configurations that cannot mean that are rejected."""
    if not cfg.scene.ndc:
        return
    if cfg.scene.kind == "nerf_synthetic":
        raise ValueError(
            "scene.ndc is the forward-facing (LLFF) parameterization; "
            "nerf_synthetic scenes are inward-facing 360 captures — "
            "rays behind the mean view direction cannot be warped"
        )
    if cfg.scene.kind in ("llff", "colmap") and not cfg.scene.llff_recenter:
        raise ValueError(
            "scene.ndc needs poses recentered to the mean camera frame: "
            "set scene.llff_recenter=true (and usually "
            "scene.llff_bd_rescale=0.75)"
        )
    if cfg.grid.mesh_path:
        raise ValueError(
            "grid.mesh_path voxelizes a WORLD-space mesh; under scene.ndc "
            "the grid lives in warped NDC coordinates — unset one of them"
        )
    if cfg.scene.ndc_near <= 0:
        raise ValueError(
            f"scene.ndc_near must be > 0, got {cfg.scene.ndc_near}"
        )
    nf = (cfg.sampler.near, cfg.sampler.far)
    if nf not in ((-1.0, -1.0), (0.0, 1.0)):
        raise ValueError(
            "under scene.ndc the warped ray runs over t in [0, 1] (near "
            "plane to infinity): set sampler.near=-1 sampler.far=-1 "
            f"(auto) or exactly (0, 1); got {nf} — the world-space near "
            "plane is scene.ndc_near"
        )


def ndc_near_or_none(cfg: Config):
    """The cameras.ndc_warp near-plane to thread to ray consumers
    (None = NDC off) — the one switch every ray-generation site keys on."""
    return cfg.scene.ndc_near if cfg.scene.ndc else None


def resolve_near_far(cfg: Config, dataset: ImageDataset) -> Config:
    """Resolve sampler.near/far = -1 (auto) from the dataset's per-view
    depth bounds (LLFF poses_bounds): near = 0.9*min, far = 1.1*max, in
    scene_scale units — the standard LLFF recipe.  No-op when both are
    explicit; scenes without bounds reject the auto setting.  Under
    scene.ndc the warped ray spans [0, 1] by construction, so auto
    resolves to exactly that."""
    if cfg.scene.ndc and (cfg.sampler.near < 0 or cfg.sampler.far < 0):
        return dataclasses.replace(
            cfg, sampler=dataclasses.replace(cfg.sampler, near=0.0, far=1.0)
        )
    if cfg.sampler.near >= 0 and cfg.sampler.far >= 0:
        return cfg
    if dataset.near_far is None:
        raise ValueError(
            "sampler.near/far=-1 (auto) needs a dataset with per-view "
            "depth bounds (LLFF poses_bounds); this scene has none — "
            "set explicit sampler.near and sampler.far"
        )
    lo = float(np.min(dataset.near_far)) * cfg.scene.scene_scale
    hi = float(np.max(dataset.near_far)) * cfg.scene.scene_scale
    near = 0.9 * lo if cfg.sampler.near < 0 else cfg.sampler.near
    far = 1.1 * hi if cfg.sampler.far < 0 else cfg.sampler.far
    return dataclasses.replace(
        cfg, sampler=dataclasses.replace(cfg.sampler, near=near, far=far)
    )


def run_training(
    cfg: Config,
    datasets: Optional[Dict[str, ImageDataset]] = None,
) -> Dict[str, float]:
    """Train a field per `cfg`; returns final metrics.

    With field_.tri_upsample_steps set (triplane encoding), training is
    staged: TensoRF's progressive coarse-to-fine grid growth, realized
    as chained single runs over the same checkpoint/metrics stream (the
    planes/lines are resampled onto a finer vertex grid and the
    optimizer re-initialized at each milestone — see _run_progressive).
    """
    if cfg.sampler.placement == "density_cdf":
        get_logger(level=cfg.logging.level).warning(
            "sampler.placement='density_cdf' measured WORSE for training "
            "than occupancy_cdf on every round-4 TPU gate (hashgrid "
            "39.18 vs 42.65 dB; freq-MLP march collapsed to 23.1 vs "
            "38.7 — the transmittance-weighted budget chases the "
            "still-learning density EMA).  It remains zero-bias as an "
            "EVAL-time placement; for training prefer occupancy_cdf."
        )
    if cfg.field_.tri_upsample_steps:
        return _run_progressive(cfg, datasets)
    return _run_training_single(cfg, datasets)


def _load_datasets(cfg: Config) -> Dict[str, ImageDataset]:
    validate_scene_background(
        cfg.scene.kind, cfg.scene.name, cfg.scene.white_background
    )
    validate_ndc(cfg)
    return load_data(
        cfg.scene.kind, cfg.scene.name, root=cfg.scene.root,
        srgb_to_linear=cfg.scene.srgb_to_linear, downscale=cfg.scene.downscale,
        proc=scene_proc_kwargs(cfg.scene), llff=scene_llff_kwargs(cfg.scene),
    )


def _tri_stage_plan(cfg: Config):
    """[(end_step, resolution)] per progressive stage — a log-linear
    resolution ladder from tri_init_resolution to tri_resolution
    (TensoRF grows the voxel count log-linearly between milestones)."""
    ms = cfg.field_.tri_upsample_steps
    r0, rf = cfg.field_.tri_init_resolution, cfg.field_.tri_resolution
    if cfg.field_.encoding != "triplane":
        raise ValueError(
            "field_.tri_upsample_steps is the triplane family's "
            f"progressive schedule; field_.encoding={cfg.field_.encoding!r}"
        )
    if cfg.train.optimize_poses:
        # Must be rejected HERE (the stage configs clear
        # tri_upsample_steps, so per-stage validation never sees the
        # combination) — otherwise stage 0 trains with a pose_deltas
        # leaf the upsample-rewrite template does not carry.
        raise ValueError(
            "train.optimize_poses does not compose with progressive "
            "triplane stages (the stage upsample rewrite does not "
            "thread the pose leaves)"
        )
    if not (0 < r0 < rf):
        raise ValueError(
            "progressive triplane needs 0 < tri_init_resolution < "
            f"tri_resolution, got {r0} vs {rf}"
        )
    if list(ms) != sorted(set(ms)) or ms[0] <= 0 or ms[-1] >= cfg.train.steps:
        raise ValueError(
            f"tri_upsample_steps must be strictly increasing within "
            f"(0, train.steps={cfg.train.steps}), got {ms}"
        )
    n = len(ms)
    if rf - r0 < n:
        raise ValueError(
            f"{n + 1} progressive stages need {n + 1} distinct "
            f"resolutions in [{r0}, {rf}] — fewer milestones or a wider "
            "resolution range"
        )
    res = [
        max(2, round(math.exp(math.log(r0) + (math.log(rf) - math.log(r0)) * k / n)))
        for k in range(n)
    ] + [rf]
    # Strictly increasing ladder: log-linear rounding can collide on
    # narrow ranges, and duplicate resolutions would make the resume
    # path's shape-based stage matching ambiguous (a mid-stage resume
    # could be misattributed to the earlier duplicate and trigger a
    # spurious optimizer-resetting rewrite).
    for k in range(1, n):
        res[k] = max(res[k], res[k - 1] + 1)
    for k in range(n - 1, -1, -1):
        res[k] = min(res[k], res[k + 1] - 1)
    return list(zip(list(ms) + [cfg.train.steps], res))


def _run_progressive(
    cfg: Config, datasets: Optional[Dict[str, ImageDataset]]
) -> Dict[str, float]:
    """Progressive-triplane stage driver.  Each stage is a normal
    _run_training_single over [prev_end, end) at that stage's
    resolution, resuming from the shared checkpoint dir; between stages
    the latest checkpoint is rewritten in place with upsampled
    planes/lines and a FRESH optimizer state (TensoRF resets the
    optimizer and restarts the LR schedule at every upsample — each
    stage's schedule spans exactly the stage length via
    train.schedule_total_steps).  keep_best and the final acceptance
    gate apply only to the last stage: earlier-stage checkpoints have
    smaller tables and would not restore under the final config."""
    log = get_logger(level=cfg.logging.level)
    plan = _tri_stage_plan(cfg)
    out_dir = cfg.logging.out_dir
    os.makedirs(out_dir, exist_ok=True)
    prov = os.path.join(out_dir, "config.json")
    if not (cfg.train.resume and os.path.exists(prov)):
        with open(prov, "w") as fh:
            fh.write(cfg.apply_overrides(["train.resume=false"]).to_json())
    if datasets is None:
        datasets = _load_datasets(cfg)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    use_grid = cfg.render.pipeline != "uniform"
    prev_ends = [0] + [end for end, _ in plan[:-1]]

    def stage_cfg(k: int) -> Config:
        end, res = plan[k]
        last = k == len(plan) - 1
        field_ = dataclasses.replace(
            cfg.field_, tri_resolution=res,
            tri_upsample_steps=(), tri_init_resolution=0,
        )
        train = dataclasses.replace(
            cfg.train, steps=end, resume=True,
            schedule_total_steps=end - prev_ends[k],
            keep_best=cfg.train.keep_best and last,
            assert_test_psnr_min=cfg.train.assert_test_psnr_min if last else 0.0,
        )
        return dataclasses.replace(cfg, field_=field_, train=train)

    def stage_template(scfg: Config):
        """Abstract (state, occ?) pytree for shape-matching a checkpoint
        to its stage (only the triplane leaves differ across stages)."""
        field = build_field(scfg)
        optimizer = create_optimizer(scfg.train)
        st = jax.eval_shape(
            lambda: init_train_state(
                field, optimizer, scfg.train.seed,
                param_ema=scfg.train.param_ema > 0,
            )
        )
        if not use_grid:
            return st
        occ_t = jax.eval_shape(lambda: init_occupancy(scfg.grid, None))
        return (st, occ_t)

    # Resume: shapes (not just the step) decide the current stage — a
    # crash between a stage's final save and the upsample rewrite leaves
    # the OLD resolution sitting at the milestone step.
    start_k = 0
    found = latest_checkpoint(ckpt_dir) if cfg.train.resume else None
    if not cfg.train.resume and latest_checkpoint(ckpt_dir) is not None:
        # Stages chain THROUGH the checkpoint stream (every stage runs
        # with resume=true), so stale checkpoints from a previous run
        # would be silently picked up as stage state.
        raise ValueError(
            f"{ckpt_dir} already has checkpoints: progressive training "
            "resumes via the checkpoint stream — pass train.resume=true "
            "to continue that run, or use a fresh out_dir"
        )
    if found is not None:
        step_got, path = found
        with np.load(path) as data:
            got = [data[f"leaf_{i}"].shape for i in range(len(data.files))]
        matched = None
        for k in range(len(plan)):
            tpl = [l.shape for l in jax.tree.leaves(stage_template(stage_cfg(k)))]
            if tpl == got:
                matched = k
                break
        if matched is None:
            raise ValueError(
                f"checkpoint {path} matches no progressive stage of this "
                "config (tri_upsample_steps / resolutions changed?)"
            )
        start_k = matched
        if step_got >= plan[matched][0] and matched < len(plan) - 1:
            _upsample_checkpoint(
                stage_cfg(matched), stage_cfg(matched + 1), ckpt_dir,
                use_grid, log,
            )
            start_k = matched + 1
        log.info("progressive resume: stage %d/%d", start_k + 1, len(plan))

    final_metrics: Dict[str, float] = {}
    for k in range(start_k, len(plan)):
        end, res = plan[k]
        log.info(
            "progressive stage %d/%d: R=%d until step %d",
            k + 1, len(plan), res, end,
        )
        final_metrics = _run_training_single(stage_cfg(k), datasets)
        if k < len(plan) - 1:
            _upsample_checkpoint(
                stage_cfg(k), stage_cfg(k + 1), ckpt_dir, use_grid, log
            )
    return final_metrics


def _upsample_checkpoint(scfg_old, scfg_new, ckpt_dir, use_grid, log):
    """Rewrite the latest checkpoint at the next stage's resolution:
    upsampled planes/lines, fresh optimizer state (next stage's
    schedule), occupancy and step carried through unchanged."""
    from tnerf.fields.triplane import upsample_triplane

    field_old = build_field(scfg_old)
    opt_old = create_optimizer(scfg_old.train)
    template = init_train_state(
        field_old, opt_old, scfg_old.train.seed,
        param_ema=scfg_old.train.param_ema > 0,
    )
    occ_t = init_occupancy(scfg_old.grid, None) if use_grid else None
    tpl = (template, occ_t) if use_grid else template
    restored = restore_checkpoint(ckpt_dir, tpl)
    if restored is None:
        raise RuntimeError(f"no checkpoint in {ckpt_dir} to upsample")
    step_got, payload = restored
    state, occ = payload if use_grid else (payload, None)
    r_new = scfg_new.field_.tri_resolution
    new_params = dict(state.params)
    new_params["triplane"] = jax.device_get(
        upsample_triplane(state.params["triplane"], r_new)
    )
    new_ema = state.ema
    if new_ema is not None:
        # the EMA shadow mirrors the params tree — resample it onto the
        # new vertex grid the same way
        new_ema = dict(new_ema)
        new_ema["triplane"] = jax.device_get(
            upsample_triplane(state.ema["triplane"], r_new)
        )
    opt_new = create_optimizer(scfg_new.train)
    new_state = TrainState(
        params=new_params,
        opt_state=opt_new.init(new_params),
        step=state.step,
        ema=new_ema,
    )
    payload = (new_state, occ) if use_grid else new_state
    save_checkpoint(ckpt_dir, step_got, payload)
    log.info(
        "upsampled triplane %d -> %d at step %d (optimizer reset)",
        scfg_old.field_.tri_resolution, r_new, step_got,
    )


def _validate_pose_opt(cfg: Config) -> None:
    """Pose refinement needs photometric gradients to reach the ray
    geometry: fail loudly on configurations whose backward treats
    positions as constants instead of silently learning nothing."""
    if cfg.render.pipeline == "fused":
        raise ValueError(
            "train.optimize_poses needs ray-geometry gradients; the "
            "fused kernel's VJP treats rays as non-differentiable — "
            "use grid_march, grid_intervals or uniform"
        )
    if cfg.field_.encoding == "hashgrid":
        from tnerf.fields.hashgrid import resolve_gather_mode

        if resolve_gather_mode(cfg.field_) != "gather":
            raise ValueError(
                "train.optimize_poses needs position gradients, but the "
                "hash grid's onehot path returns zero position "
                "cotangents — set field_.hash_gather_mode=gather"
            )
    if cfg.field_.encoding == "cp":
        from tnerf.fields.triplane import resolve_cp_mode

        if resolve_cp_mode(cfg.field_) != "gather":
            raise ValueError(
                "train.optimize_poses needs position gradients, but the "
                "CP onehot path returns zero position cotangents — set "
                "field_.tri_gather_mode=gather"
            )
    if cfg.field_.encoding == "triplane":
        from tnerf.fields.triplane import resolve_tri_mode

        if resolve_tri_mode(cfg.field_) != "gather":
            raise ValueError(
                "train.optimize_poses needs position gradients, but the "
                "triplane onehot path returns zero position cotangents "
                "— set field_.tri_gather_mode=gather"
            )
        # progressive-triplane composition is rejected in _tri_stage_plan
        # (the stage configs clear tri_upsample_steps before reaching
        # this validation)


def _run_training_single(
    cfg: Config,
    datasets: Optional[Dict[str, ImageDataset]] = None,
) -> Dict[str, float]:
    """Train a field per `cfg` (one resolution stage); returns final
    metrics."""
    log = get_logger(level=cfg.logging.level)
    if cfg.logging.debug_nans:
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
    out_dir = cfg.logging.out_dir
    os.makedirs(out_dir, exist_ok=True)
    # Provenance: the resolved config rides with the run, so a run dir
    # is self-describing (tools/summarize_runs.py, and `--config
    # <run>/config.json` reproduces it).  resume is forced off in the
    # written copy — it is run-lifecycle state, not part of the
    # experiment definition — and a resumed run keeps the original file.
    prov = os.path.join(out_dir, "config.json")
    if not (cfg.train.resume and os.path.exists(prov)):
        with open(prov, "w") as fh:
            fh.write(cfg.apply_overrides(["train.resume=false"]).to_json())
    metrics = MetricsWriter(os.path.join(out_dir, cfg.logging.metrics_file))

    if datasets is None:
        datasets = _load_datasets(cfg)
    train_ds = datasets["train"]
    log.info(
        "scene=%s/%s: %d train views %dx%d focal=%.2f",
        cfg.scene.kind, cfg.scene.name, len(train_ds),
        train_ds.width, train_ds.height, train_ds.focal,
    )
    if cfg.sampler.near < 0 or cfg.sampler.far < 0:
        cfg = resolve_near_far(cfg, train_ds)
        log.info(
            "auto near/far from dataset bounds: [%.3f, %.3f]",
            cfg.sampler.near, cfg.sampler.far,
        )

    # --- device mesh (SURVEY §2.4: shard rays, replicate params, XLA
    # all-reduces grads over ICI from the sharding constraints; optional
    # second axis shards samples-per-ray or the hash tables) ------------
    n_avail = len(jax.devices())
    n_sp = cfg.parallel.sample_parallel
    n_tp = cfg.parallel.table_parallel
    if n_sp > 1 and cfg.render.pipeline != "grid_intervals":
        raise ValueError(
            "parallel.sample_parallel shards the grid_intervals sample "
            f"axis; render.pipeline={cfg.render.pipeline!r}"
        )
    if n_tp > 1 and cfg.field_.encoding not in ("hashgrid", "triplane"):
        raise ValueError(
            "parallel.table_parallel shards hash-grid level tables or "
            f"triplane features; field_.encoding={cfg.field_.encoding!r}"
        )
    if n_tp > 1 and n_sp > 1 and cfg.field_.encoding != "hashgrid":
        raise ValueError(
            "sample-parallel x table-parallel composition folds the "
            "table-sharded encode into the SP shard_map (tp_encode_local)"
            " — hashgrid only; "
            f"field_.encoding={cfg.field_.encoding!r}"
        )
    # SP and TP compose on a 3-axis (data, sample, model) mesh: the SP
    # renderer folds the table-sharded encode into its own shard_map
    # (model_axis below) — possible only on the grid_intervals + hashgrid
    # combination, which the two checks above already enforce.
    extra_axis, n_extra = None, 1
    extra_axis2, n_extra2 = None, 1
    if n_sp > 1:
        extra_axis, n_extra = cfg.parallel.sample_axis_name, n_sp
        if n_tp > 1:
            extra_axis2, n_extra2 = cfg.parallel.table_axis_name, n_tp
    elif n_tp > 1:
        extra_axis, n_extra = cfg.parallel.table_axis_name, n_tp
    n_dp = cfg.parallel.data_parallel
    n_dp = max(1, n_avail // (n_extra * n_extra2)) if n_dp == -1 else n_dp
    mesh = None
    if n_dp > 1 or n_extra > 1 or n_extra2 > 1:
        if cfg.train.batch_size % n_dp != 0:
            raise ValueError(
                f"train.batch_size={cfg.train.batch_size} not divisible by "
                f"parallel.data_parallel={n_dp}"
            )
        if n_sp > 1 and cfg.render.chunk_size % n_dp != 0:
            # Fail at config time, not at the first mid-training eval:
            # render_image feeds the SP renderer fixed chunk_size blocks.
            raise ValueError(
                f"render.chunk_size={cfg.render.chunk_size} not divisible "
                f"by parallel.data_parallel={n_dp} (the sample-parallel "
                "renderer shards eval chunks over the data axis)"
            )
        mesh = make_mesh(
            n_dp, cfg.parallel.axis_name, extra_axis, n_extra,
            extra_axis2, n_extra2,
        )
        log.info("mesh: %s", dict(mesh.shape))
    # SP embeds BOTH axes via shard_map inside the renderer (its in_specs
    # split rays over "data" already), so eval must not re-wrap it; DP
    # and TP use the dp render wrapper (params inherit their committed
    # sharding there, so level-sharded tables survive TP eval).
    eval_mesh = mesh if n_sp == 1 else None

    field = build_field(cfg)
    if n_tp > 1:
        field = dataclasses.replace(
            field,
            table_parallel=(
                mesh, cfg.parallel.table_axis_name, cfg.parallel.axis_name
            ),
        )
    # Dense variant while the occupancy grid is still mostly occupied
    # (compaction capacity would overflow and silently drop samples);
    # compacted variant once the grid has pruned below the capacity with
    # headroom — training AND eval switch together (see the switch in
    # the step loop).
    if n_sp > 1:
        from tnerf.parallel.sample_parallel import make_sp_interval_renderer

        renderer_dense = make_sp_interval_renderer(
            field, cfg.grid, cfg.sampler, cfg.render, mesh,
            data_axis=cfg.parallel.axis_name,
            sample_axis=cfg.parallel.sample_axis_name,
            model_axis=cfg.parallel.table_axis_name if n_tp > 1 else None,
        )
        renderer_compact = renderer_dense  # SP path has no compaction
    else:
        # train.random_background: TRAIN renderers are built background-
        # free (the step composites prediction and GT over the same
        # per-ray random color via acc); EVAL renderers keep the
        # configured background so reported PSNR matches `cli eval`.
        cfg_train_r = cfg
        if cfg.train.random_background:
            cfg_train_r = dataclasses.replace(
                cfg,
                scene=dataclasses.replace(cfg.scene, white_background=False),
                render=dataclasses.replace(cfg.render, white_background=False),
            )
        renderer_dense = build_renderer(cfg_train_r, field, compact=False)
        renderer_compact = build_renderer(cfg_train_r, field, compact=True)
    if cfg.train.random_background:
        if n_sp > 1:
            raise ValueError(
                "train.random_background does not compose with "
                "parallel.sample_parallel yet (the SP renderer is built "
                "once with the configured background)"
            )
        eval_dense = build_renderer(cfg, field, compact=False)
        eval_compact = build_renderer(cfg, field, compact=True)
    else:
        eval_dense, eval_compact = renderer_dense, renderer_compact
    renderer = eval_dense
    optimizer = create_optimizer(cfg.train)
    if cfg.train.optimize_poses:
        _validate_pose_opt(cfg)
    if cfg.train.freq_anneal_steps > 0:
        if cfg.field_.encoding != "frequency":
            raise ValueError(
                "train.freq_anneal_steps anneals the frequency positional "
                "encoding (the grid families have their own coarse-to-fine:"
                " hash_nearest_levels / tri_upsample_steps); "
                f"field_.encoding={cfg.field_.encoding!r}"
            )
        if cfg.render.pipeline == "fused":
            raise ValueError(
                "train.freq_anneal_steps needs the XLA field path; the "
                "fused kernel bakes the full-frequency encoding algebra "
                "— use grid_march, grid_intervals or uniform"
            )
    state = init_train_state(
        field, optimizer, cfg.train.seed,
        pose_extra_params(cfg, len(train_ds)),
        param_ema=cfg.train.param_ema > 0,
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(state.params))
    log.info("field=%s/%s params=%.2fM pipeline=%s", cfg.field_.encoding,
             field.arch, n_params / 1e6, cfg.render.pipeline)

    use_grid = cfg.render.pipeline != "uniform"  # grid_* and fused all use occupancy
    # Mesh-bounded scenes (grid.mesh_path): the voxelized mesh is a
    # STATIC mask — marching starts from it and occupancy updates prune
    # within it (never escape it).  Rebuilt from config, not checkpointed.
    occ_mask = None
    if use_grid and cfg.grid.mesh_path:
        from tnerf.grid.mesh import mesh_occupancy_mask

        occ_mask = jnp.asarray(mesh_occupancy_mask(cfg.grid))
        log.info(
            "mesh bound %s: %.1f%% of cells occupied at init",
            cfg.grid.mesh_path, 100.0 * float(occ_mask.mean()),
        )
    occ: Optional[OccupancyGridState] = (
        init_occupancy(cfg.grid, occ_mask) if use_grid else None
    )

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    start_step = 0
    if cfg.train.resume:
        template = (state, occ) if occ is not None else state
        restored = restore_checkpoint(ckpt_dir, template)
        if restored is not None:
            start_step, payload = restored
            if occ is not None:
                state, occ = payload
            else:
                state = payload
            log.info("resumed from step %d", start_step)

    state_sharding = None
    if mesh is not None and n_tp > 1:
        from tnerf.parallel.table_parallel import tp_state_sharding

        state_sharding = tp_state_sharding(
            state, mesh, cfg.parallel.table_axis_name
        )

    sampler = PixelSampler(
        train_ds, cfg.scene.scene_scale, cfg.scene.white_background,
        ndc_near=ndc_near_or_none(cfg),
        random_background=cfg.train.random_background,
    )
    pose_setup = None
    if cfg.train.optimize_poses:
        pose_setup = (
            sampler.poses, sampler.width, sampler.height, sampler.camera,
            sampler.scene_scale, sampler.ndc_near,
        )
    if cfg.train.distortion_weight > 0.0:
        if cfg.render.pipeline == "fused":
            raise ValueError(
                "train.distortion_weight needs per-sample compositing "
                "weights; the fused kernel composites on-chip and never "
                "materializes them — use grid_march, grid_intervals or "
                "uniform"
            )
        if cfg.render.pipeline == "grid_march" and cfg.render.compact:
            raise ValueError(
                "train.distortion_weight does not compose with "
                "render.compact on grid_march (the packed-compaction "
                "compositor returns no per-sample weights) — set "
                "render.compact=false"
            )
        if n_sp > 1:
            raise ValueError(
                "train.distortion_weight needs whole-ray weight "
                "distributions; parallel.sample_parallel shards the "
                "sample axis across chips"
            )
    loss_kw = dict(
        remat=cfg.train.remat, loss=cfg.train.loss,
        huber_delta=cfg.train.huber_delta,
        table_l1=cfg.train.table_l1_weight,
        table_tv=cfg.train.table_tv_weight,
        # span-normalized: raw-t distortion scales linearly with the
        # sampled range, so dividing by (far - near) makes the knob
        # equivalent to the paper's s-space formulation
        distortion=cfg.train.distortion_weight
        / max(cfg.sampler.far - cfg.sampler.near, 1e-6),
        random_bg=cfg.train.random_background,
        param_ema=cfg.train.param_ema,
        pose_setup=pose_setup,
        freq_anneal=cfg.train.freq_anneal_steps,
    )
    if cfg.train.table_tv_weight > 0.0 and cfg.field_.encoding != "triplane":
        raise ValueError(
            "train.table_tv_weight is the triplane family's smoothness "
            "prior (hash tables have no spatial adjacency); "
            f"field_.encoding={cfg.field_.encoding!r}"
        )
    step_dense = make_train_step(renderer_dense, optimizer, **loss_kw)
    step_compact = (
        make_train_step(renderer_compact, optimizer, **loss_kw)
        if use_grid and cfg.render.compact and n_sp == 1
        else step_dense
    )
    if mesh is not None:
        dp = lambda s: make_dp_train_step(
            s, mesh, cfg.parallel.axis_name, with_occupancy=use_grid,
            state_sharding=state_sharding,
        )
        wrapped_dense = dp(step_dense)
        step_compact = wrapped_dense if step_compact is step_dense else dp(step_compact)
        step_dense = wrapped_dense
    train_step = step_dense
    # switch to the compacted step once occupied cells fit the capacity
    # with ~40% headroom (sample hit-rate tracks cell occupancy loosely).
    # Under occupancy-CDF placement the cell proxy is meaningless
    # (samples concentrate in occupied cells by design) — plan capacity
    # from the measured occupied-SAMPLE fraction instead.
    compact_switch_frac = cfg.render.compact_fraction * 0.6
    occ_frac_host = 1.0
    switch_frac_host = 1.0
    cdf_frac_fn = None
    if (
        use_grid
        and cfg.render.compact
        and n_sp == 1
        and cfg.sampler.placement in ("occupancy_cdf", "density_cdf")
    ):
        from tnerf.render.grid_renderer import cdf_occupied_sample_fraction

        cdf_frac_fn = jax.jit(
            lambda r, payload: cdf_occupied_sample_fraction(
                r, payload, cfg.grid, cfg.sampler
            )
        )

    update_occ = None
    if use_grid:
        if mesh is not None and n_tp == 1:
            # SURVEY §2.4 "sharded occupancy update": the res^3 density
            # probes shard over every mesh axis (params are replicated
            # on DP / DPxSP meshes) instead of running replicated on
            # each chip; bit-identical by construction.  Table-parallel
            # keeps the replicated update — its density eval needs the
            # cross-shard encode of the TP renderer's own shard_map.
            from tnerf.parallel.occupancy import make_sharded_occupancy_update

            update_occ = make_sharded_occupancy_update(
                lambda p, x: field.density(p, x), cfg.grid, mesh,
                mask=occ_mask,
            )
        else:

            def _update_occ(occ_state, params, key):
                return update_occupancy(
                    occ_state, lambda x: field.density(params, x), cfg.grid,
                    key, mask=occ_mask,
                )

            # Occupancy state is logically replicated; pin the output so
            # XLA cannot hand back a data-sharded bitfield (the eval
            # render wrapper and the next train step constrain it
            # replicated).
            occ_out = (
                None if mesh is None
                else jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
            )
            update_occ = jax.jit(_update_occ, out_shardings=occ_out)

    key = jax.random.PRNGKey(cfg.train.seed + 1)
    if mesh is not None:
        # Params/opt-state/occupancy/keys replicated across the mesh
        # (table-parallel: the tables + their optimizer mirrors shard
        # level-major instead); the ray axis shards per-step below.
        state = (
            jax.device_put(state, state_sharding)
            if state_sharding is not None
            else replicate(state, mesh)
        )
        key = replicate(key, mesh)
        if occ is not None:
            occ = replicate(occ, mesh)
    rays_per_step = cfg.train.batch_size
    final_metrics: Dict[str, float] = {}
    # Renderer occupancy payload: constant between occupancy updates —
    # computed here and after each update_occ instead of re-dispatching
    # res^3 selects every step of the async loop (density_cdf's payload
    # is two jnp.where ops over the full grid).
    occ_payload = renderer_payload(occ, cfg.sampler, cfg.grid)
    best_psnr = _restore_best_psnr(cfg, start_step, log)  # keep_best tracker
    with maybe_profile(cfg.logging.profile, os.path.join(out_dir, "profile")):
        n_pixels = len(train_ds) * train_ds.height * train_ds.width
        steps_per_epoch = max(1, n_pixels // rays_per_step)
        # Async dispatch: steps are ENQUEUED without a per-step host
        # sync — the only host round-trips between log points are the
        # occupancy-switch floats every grid.update_every steps.  A
        # per-step block_until_ready + float(loss) costs two host<->
        # device round-trips per step, which dominates wall time over a
        # high-latency link (the measured isolated-step vs real-loop
        # throughput gap).  rays/s is therefore measured per WINDOW
        # (steps since the last sync point), which is also the honest
        # number — it amortizes dispatch instead of timing one step.
        window_t0 = time.perf_counter()
        window_steps = 0
        # pre-bind for the interrupt handler: an interrupt before the
        # first loop iteration (or an already-complete resume) must not
        # hit an unbound loop variable
        step = start_step
        try:
            for step in range(start_step, cfg.train.steps):
                key, k_batch, k_render, k_occ = jax.random.split(key, 4)
                # meta only when pose refinement is on: keeps the
                # default call signature stable for sampler test stubs
                meta_kw = {"meta": True} if cfg.train.optimize_poses else {}
                if cfg.train.shuffle == "epoch":
                    epoch = step // steps_per_epoch
                    batch = sampler.sample_epoch(
                        jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed), epoch),
                        jnp.asarray(step % steps_per_epoch),
                        rays_per_step,
                        **meta_kw,
                    )
                else:
                    batch = sampler.sample(k_batch, rays_per_step, **meta_kw)
                if mesh is not None:
                    batch = shard_batch(batch, mesh, cfg.parallel.axis_name)
                step_args = (
                    (state, batch, k_render)
                    + ((occ_payload,) if use_grid else ())
                )
                state, aux = train_step(*step_args)
                window_steps += 1
                if (
                    use_grid
                    and step >= cfg.grid.warmup_steps
                    and step % cfg.grid.update_every == 0
                ):
                    occ = update_occ(occ, state.params, k_occ)
                    occ_payload = renderer_payload(occ, cfg.sampler, cfg.grid)
                    occ_frac_host = float(occupancy_fraction(occ))
                    if cdf_frac_fn is not None:
                        # Under pose refinement the batch is a PoseBatch
                        # (no .rays); the capacity probe only needs ray
                        # GEOMETRY, so the dataset poses (zero deltas)
                        # are the right stand-in.
                        probe_rays = (
                            batch.rays if hasattr(batch, "rays")
                            else sampler.regen_rays(batch)
                        )
                        switch_frac_host = float(
                            cdf_frac_fn(probe_rays, occ_payload)
                        )
                    else:
                        switch_frac_host = occ_frac_host
                    compacted = switch_frac_host < compact_switch_frac
                    train_step = step_compact if compacted else step_dense
                    # Eval follows the same switch: once the pruned grid
                    # fits the compaction capacity, compacted rendering
                    # is exact (no overflow drops) and, for fields with
                    # an expensive per-sample encoding (hashgrid), ~5x
                    # faster than dense-masked eval.
                    if cfg.render.compact:
                        renderer = eval_compact if compacted else eval_dense

                if step % cfg.train.log_every == 0 or step == cfg.train.steps - 1:
                    jax.block_until_ready(aux["loss"])
                    sec = (time.perf_counter() - window_t0) / max(window_steps, 1)
                    loss_host = float(aux["loss"])
                    m = {
                        "loss": loss_host,
                        "train_psnr": float(aux["psnr"]),
                        "acc_mean": float(aux["acc_mean"]),
                        "rays_per_sec": rays_per_step / max(sec, 1e-9),
                        "step_seconds": sec,
                    }
                    if occ is not None:
                        m["occupancy_frac"] = float(occupancy_fraction(occ))
                    if "distortion" in aux:
                        m["distortion"] = float(aux["distortion"])
                    metrics.write(step, **m)
                    log.info(
                        "step %d loss=%.5f psnr=%.2f rays/s=%.0f%s",
                        step, m["loss"], m["train_psnr"], m["rays_per_sec"],
                        f" occ={m['occupancy_frac']:.2f}" if occ is not None else "",
                    )
                    if not np.isfinite(loss_host):
                        # advisory only — apply_if_finite already skipped the
                        # bad update(s); detection granularity is log_every
                        log.warning(
                            "non-finite loss at step %d (update was skipped)", step
                        )
                    window_t0 = time.perf_counter()
                    window_steps = 0

                did_barrier = False
                if cfg.train.eval_every and (step + 1) % cfg.train.eval_every == 0:
                    em = _eval(cfg, renderer, state, occ, datasets, step, log,
                               metrics, mesh=eval_mesh)
                    final_metrics.update(em)
                    best_psnr = _maybe_keep_best(
                        cfg, em, state, occ, step + 1, best_psnr, log, metrics
                    )
                    did_barrier = True

                if cfg.train.checkpoint_every and (step + 1) % cfg.train.checkpoint_every == 0:
                    payload = (state, occ) if occ is not None else state
                    save_checkpoint(ckpt_dir, step + 1, payload)
                    did_barrier = True
                if did_barrier:
                    # eval/checkpoint wall time must not pollute the rays/s window
                    window_t0 = time.perf_counter()
                    window_steps = 0

        except KeyboardInterrupt:
            # Interrupt-safe shutdown (a capability the reference
            # lacks: its training state dies with the process,
            # main.cu:328-342).  The loop variables in this scope
            # hold the last completed step's state — persist it so
            # train.resume continues from the interrupted step
            # instead of the last periodic checkpoint.
            payload = (state, occ) if occ is not None else state
            save_checkpoint(ckpt_dir, step, payload)
            log.warning(
                "interrupted at step %d: checkpoint saved to %s "
                "(continue with train.resume=true)", step, ckpt_dir,
            )
            metrics.close()
            raise
    payload = (state, occ) if occ is not None else state
    save_checkpoint(ckpt_dir, cfg.train.steps, payload)
    em = _eval(cfg, renderer, state, occ, datasets, cfg.train.steps, log,
               metrics, save_images=True, mesh=eval_mesh)
    final_metrics.update(em)
    _maybe_keep_best(
        cfg, em, state, occ, cfg.train.steps, best_psnr, log, metrics
    )
    metrics.close()
    # Acceptance gate on the WORST final test view (checkpoint/metrics
    # are already on disk — the raise marks the run failed, it does not
    # destroy its evidence).
    floor = cfg.train.assert_test_psnr_min
    if floor > 0 and "psnr_test_min" in final_metrics:
        got = final_metrics["psnr_test_min"]
        if got < floor:
            raise RuntimeError(
                f"acceptance gate failed: psnr_test_min={got:.2f} dB < "
                f"train.assert_test_psnr_min={floor} (mean "
                f"{final_metrics.get('psnr_test', float('nan')):.2f})"
            )
    return final_metrics


def _restore_best_psnr(cfg, start_step, log):
    """keep_best tracker across resumes: without this a resumed run
    restarts the tracker at -inf, and its first eval — possibly WORSE
    than the recorded best — would write a higher-step file into
    checkpoints_best, which latest_checkpoint would then prefer.  The
    best_psnr entries in the (append-only) metrics.jsonl are the source
    of truth."""
    if not (cfg.train.keep_best and start_step > 0):
        return -np.inf
    path = os.path.join(cfg.logging.out_dir, cfg.logging.metrics_file)
    best = -np.inf
    try:
        with open(path) as fh:
            for line in fh:
                try:
                    v = json.loads(line).get("best_psnr")
                except ValueError:
                    continue
                if v is not None and np.isfinite(v):
                    best = max(best, float(v))
    except OSError:
        return best
    if np.isfinite(best):
        log.info("keep_best resumed: best so far %.2f dB", best)
    return best


def _maybe_keep_best(cfg, eval_metrics, state, occ, step, best, log, metrics):
    """train.keep_best: save <out_dir>/checkpoints_best when this eval's
    PSNR (val split when present, else test) improves on the best so
    far.  Returns the new best.  Each improvement writes a higher
    step_N.npz, so latest_checkpoint on the best dir is always the best
    checkpoint."""
    if not cfg.train.keep_best:
        return best
    v = eval_metrics.get("psnr_val", eval_metrics.get("psnr_test"))
    if v is None or not np.isfinite(v) or v <= best:
        return best
    bdir = os.path.join(cfg.logging.out_dir, "checkpoints_best")
    payload = (state, occ) if occ is not None else state
    save_checkpoint(bdir, step, payload)
    metrics.write(step - 1, best_psnr=float(v), best_step=step)
    log.info("new best checkpoint: step %d (%.2f dB) -> %s", step, v, bdir)
    return v


def _eval(cfg, renderer, state, occ, datasets, step, log, metrics,
          save_images=False, mesh=None):
    out: Dict[str, float] = {}
    bits = renderer_payload(occ, cfg.sampler, cfg.grid)
    for split in ("val", "test"):
        if split not in datasets or len(datasets[split]) == 0:
            continue
        save_dir = (
            os.path.join(cfg.logging.out_dir, f"renders_{step}") if save_images else None
        )
        m = evaluate(
            renderer, eval_params(state), datasets[split],
            cfg.scene.scene_scale,
            white_background=cfg.scene.white_background,
            max_views=None if save_images else 2,
            save_dir=save_dir, chunk_size=cfg.render.chunk_size,
            occupancy=bits, mesh=mesh, ndc_near=ndc_near_or_none(cfg),
        )
        if cfg.render.pipeline == "fused":
            # The in-training eval renderer runs fused_train_rpc (built
            # with for_eval=False); `cli eval` uses render.fused_rpc.
            # Record which quadrature produced this PSNR so the two are
            # never compared as equals (they can differ by >1 dB when
            # fused_rpc reduces the per-ray sample budget).  Likewise
            # ray compaction is an eval-only renderer feature, so any
            # fps derived from in-training eval timings is NOT the
            # BENCH render fps (which times the for_eval renderer).
            m["eval_fused_rpc"] = cfg.render.fused_train_rpc
            m["eval_ray_compact"] = 0.0
        out.update(m)
        log.info("eval step %d: %s", step, m)
        metrics.write(step, **m)
    return out
