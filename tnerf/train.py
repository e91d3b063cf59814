"""Training: optimizer, train step, ray batching.

TPU-native replacement for the reference's epoch/batch loop
(main.cu:612-804).  Key re-designs over the reference:

- Ray batches are (image, pixel) index draws regenerated on device each
  step — no host-side shuffle of a giant payload vector
  (main.cu:615-626, defects D11/D16), no per-iteration mallocs.
- The whole step (sample -> encode -> MLP -> composite -> loss -> grads ->
  Adam) is ONE jitted function with donated state; XLA handles ordering
  (the reference ran forward and backward on two unsynchronized CUDA
  streams — defect D14).
- Loss is evaluated on per-ray pixels and the chain rule through
  compositing maps it to per-sample gradients automatically (the
  reference conflated per-ray and per-sample gradient layouts, D6/D7).
- Non-finite losses skip the update instead of corrupting params
  (failure-detection subsystem, SURVEY §5).

Defaults mirror reference main.cu:39-46,185-186,344: L2 loss,
Adam(1e-3, 0.9, 0.999, 1e-8), seed 1337.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tnerf.cameras import Rays, compose_pose, ndc_warp, pixel_rays, se3_exp
from tnerf.config import Config, TrainConfig
from tnerf.data.dataset import ImageDataset


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32
    # Polyak weight EMA (train.param_ema > 0): a params-shaped shadow
    # tree updated ema = d*ema + (1-d)*params each step; eval and
    # checkpoint-best read it.  None when disabled — jax.tree treats
    # None as an empty subtree, so the checkpoint layout of ema-free
    # configs is unchanged.
    ema: "dict | None" = None


class RayBatch(NamedTuple):
    rays: Rays
    gt_rgb: jnp.ndarray  # [B, 3] (or [B, 4] straight RGBA under
    #                      train.random_background)


class PoseBatch(NamedTuple):
    """Pre-ray batch for pose refinement (train.optimize_poses): ray
    generation moves INSIDE the differentiated loss so gradients reach
    the per-image pose deltas; the step regenerates rays from these."""

    img: jnp.ndarray  # [B] i32 training-image index
    pix: jnp.ndarray  # [B, 2] f32 pixel (x, y)
    gt_rgb: jnp.ndarray  # [B, 3]


def create_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam/AdamW with optional linear LR warmup, exponential decay,
    gradient accumulation and non-finite protection.

    Schedule knobs are expressed in LOOP steps; with grad_accum_steps=k
    the inner optimizer only updates every k-th loop step, so schedule
    lengths are divided by k to keep the warmup/decay endpoints where
    the user put them.  apply_if_finite wraps OUTSIDE the accumulation:
    a non-finite microbatch is skipped entirely instead of poisoning the
    whole accumulation window."""
    accum = max(cfg.grad_accum_steps, 1)
    horizon = cfg.schedule_total_steps or cfg.steps
    updates_total = max(horizon // accum, 1)
    warmup_updates = cfg.lr_warmup_steps // accum
    if cfg.lr_final_fraction != 1.0:
        schedule = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=max(updates_total - warmup_updates, 1),
            decay_rate=cfg.lr_final_fraction,
        )
    else:
        # plain float, NOT constant_schedule: a schedule adds a count
        # leaf to the optimizer state, which would invalidate every
        # checkpoint written by a schedule-free config (the treedef
        # template check rejects the extra leaf on restore)
        schedule = cfg.lr
    if warmup_updates > 0:
        base = (
            schedule if callable(schedule)
            else optax.constant_schedule(schedule)
        )
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, warmup_updates), base],
            [warmup_updates],
        )
    if cfg.weight_decay > 0.0:
        opt = optax.adamw(
            schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        opt = optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
    if cfg.grad_clip > 0.0:
        # clip the raw gradients BEFORE Adam sees them
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    def _key_mask(keys):
        """Mask selecting the top-level param subtrees named in `keys`."""
        return lambda params: {
            k: jax.tree.map(lambda _: k in keys, v)
            for k, v in params.items()
        }

    if cfg.table_lr_mult != 1.0:
        # Scale the post-Adam UPDATE of feature-table leaves: Adam's
        # update is -lr * m_hat/(sqrt(v_hat)+eps), so a post-scale by c
        # is exactly an LR multiplier of c for those params (with adamw
        # it also scales the decay term — table weight decay stays
        # proportional).  Table leaves are the top-level "hashgrid" /
        # "triplane" encoding subtrees of the param dict.
        opt = optax.chain(
            opt,
            optax.masked(
                optax.scale(cfg.table_lr_mult),
                _key_mask(("hashgrid", "triplane", "cp")),
            ),
        )
    if cfg.pose_lr_mult != 1.0:
        # Same post-Adam masked-scale trick as table_lr_mult, applied to
        # the pose-refinement deltas (train.optimize_poses).
        opt = optax.chain(
            opt,
            optax.masked(
                optax.scale(cfg.pose_lr_mult), _key_mask(("pose_deltas",))
            ),
        )
    if accum > 1:
        opt = optax.MultiSteps(
            opt, every_k_schedule=accum
        ).gradient_transformation()
    if cfg.skip_nonfinite:
        opt = optax.apply_if_finite(opt, max_consecutive_errors=1000)
    return opt


# Module-level so each epoch's permutation reuses one compiled function
# (a fresh jax.jit wrapper per cache miss would retrace every epoch).
_jitted_permutation = jax.jit(jax.random.permutation, static_argnums=1)


class PixelSampler:
    """Draws random (image, pixel) ray batches fully on device.

    Holds the stacked training images/poses as device arrays; each draw is
    three randints + gathers + ray regeneration (pure FLOPs) — the
    replacement for the reference's host-side std::random_shuffle over
    pre-traced payload vectors (main.cu:615-626).
    """

    def __init__(
        self,
        dataset: ImageDataset,
        scene_scale: float,
        white_background: bool,
        ndc_near: Optional[float] = None,
        random_background: bool = False,
    ):
        if random_background:
            # keep straight RGBA: the train step composites GT over the
            # per-ray random background itself (train.random_background)
            if dataset.channels != 4:
                raise ValueError(
                    "train.random_background needs GT alpha; this "
                    f"dataset has {dataset.channels} channels"
                )
            images = np.asarray(dataset.images, np.float32)  # [N, H, W, 4]
        else:
            images = dataset.composited(white_background)  # [N, H, W, 3]
        self.images = jnp.asarray(images)
        self.poses = jnp.asarray(dataset.poses)
        self.width = dataset.width
        self.height = dataset.height
        self.focal = float(dataset.focal)
        # scalar focal, or (fx, fy, cx, cy) for full-intrinsics scenes
        self.camera = dataset.camera
        self.scene_scale = float(scene_scale)
        # scene.ndc: warp generated rays into NDC (None = off)
        self.ndc_near = None if ndc_near is None else float(ndc_near)

    @partial(jax.jit, static_argnames=("self", "batch_size", "meta"))
    def sample(
        self, key: jax.Array, batch_size: int, meta: bool = False
    ) -> RayBatch:
        """IID pixel draw with replacement (standard NeRF training).
        meta=True returns a PoseBatch (indices + pixels, no rays) for
        pose refinement — ray generation then happens inside the loss."""
        k_img, k_x, k_y = jax.random.split(key, 3)
        n = self.images.shape[0]
        img = jax.random.randint(k_img, (batch_size,), 0, n)
        x = jax.random.randint(k_x, (batch_size,), 0, self.width)
        y = jax.random.randint(k_y, (batch_size,), 0, self.height)
        return self._gather(img, x, y, meta)

    def sample_epoch(
        self, epoch_key: jax.Array, step_in_epoch: jnp.ndarray,
        batch_size: int, meta: bool = False,
    ) -> RayBatch:
        """Epoch-shuffled batching without replacement: a device-side
        permutation of ALL pixels, sliced per step — the reference's
        `std::random_shuffle` over its ray-payload vector (main.cu:615)
        without the host round-trip, and without its ragged-final-batch
        overrun (D11: batches wrap around the permutation instead).

        The O(N log N) permutation is computed ONCE per epoch (cached on
        the epoch key) — the per-step work is a B-element modular gather,
        not a re-shuffle of all N pixels."""
        perm = self._epoch_perm(epoch_key)
        return self._slice_perm(perm, step_in_epoch, batch_size, meta)

    def _epoch_perm(self, epoch_key: jax.Array) -> jax.Array:
        kb = np.asarray(jax.random.key_data(epoch_key)).tobytes()
        if getattr(self, "_perm_cache_key", None) != kb:
            n_img = self.images.shape[0]
            total = n_img * self.height * self.width
            self._perm_cache = _jitted_permutation(epoch_key, total)
            self._perm_cache_key = kb
        return self._perm_cache

    @partial(jax.jit, static_argnames=("self", "batch_size", "meta"))
    def _slice_perm(
        self, perm: jax.Array, step_in_epoch: jnp.ndarray, batch_size: int,
        meta: bool = False,
    ) -> RayBatch:
        total = perm.shape[0]
        start = (step_in_epoch * batch_size) % total
        idx = perm[(start + jnp.arange(batch_size)) % total]
        img = idx // (self.height * self.width)
        rem = idx % (self.height * self.width)
        y = rem // self.width
        x = rem % self.width
        return self._gather(img, x, y, meta)

    def _gather(self, img, x, y, meta: bool = False):
        gt = self.images[img, y, x]
        pix = jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32)], axis=-1)
        if meta:
            return PoseBatch(img=img.astype(jnp.int32), pix=pix, gt_rgb=gt)
        rays = pixel_rays(
            self.poses[img], pix, self.width, self.height, self.camera,
            self.scene_scale,
        )
        if self.ndc_near is not None:
            rays = ndc_warp(
                rays, self.width, self.height, self.camera, self.ndc_near
            )
        return RayBatch(rays=rays, gt_rgb=gt)

    def regen_rays(self, batch: "PoseBatch") -> Rays:
        """Rays for a PoseBatch from the DATASET poses (zero deltas) —
        geometry-only probes (the occupancy capacity probe) that must see
        the same ray space (incl. the NDC warp) as training batches."""
        rays = pixel_rays(
            self.poses[batch.img], batch.pix, self.width, self.height,
            self.camera, self.scene_scale,
        )
        if self.ndc_near is not None:
            rays = ndc_warp(
                rays, self.width, self.height, self.camera, self.ndc_near
            )
        return rays

    def __hash__(self):  # allow use as a static jit arg
        return id(self)

    def __eq__(self, other):
        return self is other


def photometric_loss(
    err: jnp.ndarray, kind: str = "l2", huber_delta: float = 0.1
) -> jnp.ndarray:
    """Scalar photometric loss from per-pixel RGB error [..., 3].

    "l2" is the reference's hardcoded choice (main.cu:39); "l1" and
    "huber" (quadratic within delta, linear beyond) are the standard
    robust alternatives.  Elementwise-only — XLA fuses it into the
    backward epilogue regardless of kind."""
    if kind == "l2":
        return jnp.mean(jnp.square(err))
    if kind == "l1":
        return jnp.mean(jnp.abs(err))
    if kind == "huber":
        a = jnp.abs(err)
        d = jnp.float32(huber_delta)
        return jnp.mean(
            jnp.where(a <= d, 0.5 * jnp.square(err), d * (a - 0.5 * d))
        )
    raise ValueError(f"train.loss must be l2, l1 or huber, got {kind!r}")


def make_train_step(
    renderer: Callable,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
    loss: str = "l2",
    huber_delta: float = 0.1,
    table_l1: float = 0.0,
    table_tv: float = 0.0,
    distortion: float = 0.0,
    random_bg: bool = False,
    param_ema: float = 0.0,
    pose_setup: Optional[tuple] = None,
    freq_anneal: int = 0,
) -> Callable[[TrainState, RayBatch, jax.Array], Tuple[TrainState, dict]]:
    """Build the jitted train step: photometric loss + Adam update.

    remat=True wraps the renderer in jax.checkpoint, dropping forward
    activations (per-sample encodings/hidden states — the big buffers)
    and recomputing them in backward: activation memory ~O(batch) instead
    of O(batch * samples * width).

    table_l1 > 0 adds an L1 penalty (mean |entry| per table, summed) on
    feature-table params — the hashgrid/triplane subtrees — TensoRF's
    sparsity prior: unobserved table entries shrink to zero instead of
    keeping their init noise (suppresses floaters in free space).

    table_tv > 0 adds TensoRF's total-variation penalty on the triplane
    VM factors (adjacent-vertex smoothness; hash tables have no spatial
    adjacency so TV only applies to the triplane subtree — the caller
    validates the encoding, train_loop.py).

    pose_setup = (poses0 [N, 4, 4], width, height, camera, scene_scale,
    ndc_near-or-None) enables pose refinement: the step consumes PoseBatch instead of
    RayBatch, regenerates rays INSIDE the loss from
    exp(params["pose_deltas"][img]) @ poses0[img], and the photometric
    gradient flows through the ray geometry into the per-image deltas
    (train.optimize_poses; requires an encoding with position
    gradients — the caller validates, train_loop.py).
    """
    if remat:
        renderer = jax.checkpoint(renderer, static_argnums=())
    photometric_loss(jnp.zeros((1, 3)), loss, huber_delta)  # validate early

    def loss_fn(params: dict, batch, key: jax.Array, occupancy):
        if pose_setup is not None:
            poses0, w, h, cam, ss, nd = pose_setup
            delta = se3_exp(params["pose_deltas"][batch.img])
            rays = pixel_rays(
                compose_pose(delta, poses0[batch.img]), batch.pix, w, h,
                cam, ss,
            )
            if nd is not None:
                # NDC composes with pose refinement: the warp is a fixed
                # differentiable reparameterization, so photometric
                # gradients still reach the SE(3) deltas through it
                rays = ndc_warp(rays, w, h, cam, nd)
        else:
            rays = batch.rays
        if random_bg:
            # instant-ngp alpha supervision (train.random_background):
            # GT alpha and the renderer's accumulated opacity composite
            # over the SAME per-ray random color, so any free-space
            # density that fakes the background on one draw mismatches
            # the next — sigma must go to zero instead.  The renderer is
            # built background-free (run_training passes a no-bg config),
            # so res.rgb is the pure object radiance.
            k_render, k_bg = jax.random.split(key)
            res = renderer(params, rays, k_render, occupancy)
            bg = jax.random.uniform(k_bg, (*res.acc.shape, 3), jnp.float32)
            a = batch.gt_rgb[..., 3:4]
            gt = batch.gt_rgb[..., :3] * a + bg * (1.0 - a)
            pred = res.rgb + (1.0 - res.acc)[..., None] * bg
            err = pred - gt
        else:
            res = renderer(params, rays, key, occupancy)
            err = res.rgb - batch.gt_rgb
        mse = jnp.mean(jnp.square(err))
        obj = mse if loss == "l2" else photometric_loss(err, loss, huber_delta)
        if table_l1 > 0.0:
            for k in ("hashgrid", "triplane", "cp"):
                if k in params:
                    obj = obj + table_l1 * sum(
                        jnp.abs(leaf).mean()
                        for leaf in jax.tree.leaves(params[k])
                    )
        if table_tv > 0.0 and "triplane" in params:
            from tnerf.fields.triplane import triplane_tv

            obj = obj + table_tv * triplane_tv(params["triplane"])
        if distortion > 0.0:
            # per-ray mip-NeRF 360 distortion from the compositor
            # (composite.distortion_term); the caller pre-divides the
            # weight by (far - near) so the term is span-normalized.
            # Zero-width pipelines (fused / packed compaction / SP) are
            # rejected at config time — their res.distortion is 0.
            dist = jnp.mean(res.distortion)
            obj = obj + distortion * dist
        aux = {
            "loss": obj,
            # PSNR always from the MSE: comparable across loss choices
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
            "acc_mean": jnp.mean(res.acc),
        }
        if distortion > 0.0:
            aux["distortion"] = dist
        if pose_setup is not None:
            aux["pose_delta_norm"] = jnp.mean(
                jnp.linalg.norm(params["pose_deltas"], axis=-1)
            )
        return obj, aux

    @jax.jit
    def train_step(
        state: TrainState,
        batch: RayBatch,
        key: jax.Array,
        occupancy: Optional[jnp.ndarray] = None,
    ):
        params_in = state.params
        if freq_anneal > 0:
            # BARF schedule state rides in params (train.freq_anneal_steps):
            # derived from the traced step, so no retrace per step; its
            # gradient is cut inside the field (stop_gradient) and the
            # Adam update of a zero gradient is zero, so the written-back
            # leaf is exactly this step's alpha (checkpoints carry it —
            # a restored mid-anneal eval renders with the right window).
            alpha = jnp.clip(
                state.step.astype(jnp.float32) / freq_anneal, 0.0, 1.0
            )
            params_in = {**params_in, "freq_alpha": alpha}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_in, batch, key, occupancy
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, params_in)
        params = optax.apply_updates(params_in, updates)
        if freq_anneal > 0:
            # Pin the schedule leaf to exactly this step's alpha: Adam's
            # update of the zero gradient is zero, but adamw's decoupled
            # weight decay would shave it each step otherwise.
            params = {**params, "freq_alpha": alpha}
        ema = state.ema
        if param_ema > 0.0:
            # Polyak shadow weights: initialized to a params copy at
            # step 0 (init_train_state), so no bias correction needed.
            d = jnp.float32(param_ema)
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema, params
            )
        return TrainState(params, opt_state, state.step + 1, ema), aux

    return train_step


def pose_extra_params(cfg: Config, n_train_images: int) -> Optional[dict]:
    """The extra init_train_state entries beyond the field's own params
    (None when nothing extra) — shared by the train loop and every CLI
    restore template, which must mirror the checkpoint's leaves exactly:

    - train.optimize_poses: the [N, 6] pose-delta leaf (+ Adam mirrors).
    - train.freq_anneal_steps: the scalar BARF `freq_alpha` schedule
      leaf the train step rides (see make_train_step).
    """
    extra = {}
    if cfg.train.optimize_poses:
        extra["pose_deltas"] = jnp.zeros((n_train_images, 6), jnp.float32)
    if cfg.train.freq_anneal_steps > 0:
        extra["freq_alpha"] = jnp.zeros((), jnp.float32)
    return extra or None


def init_train_state(
    field, optimizer: optax.GradientTransformation, seed: int,
    extra_params: Optional[dict] = None,
    param_ema: bool = False,
) -> TrainState:
    """extra_params: additional top-level param entries initialized
    alongside the field (e.g. {"pose_deltas": zeros[N, 6]} under
    train.optimize_poses) — they must be present BEFORE optimizer.init
    so the optimizer state mirrors them.  param_ema=True seeds the EMA
    shadow tree with a copy of the init params (train.param_ema)."""
    params = field.init(jax.random.PRNGKey(seed))
    if extra_params:
        params = {**params, **extra_params}
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        ema=jax.tree.map(jnp.copy, params) if param_ema else None,
    )


def eval_params(state: TrainState) -> dict:
    """The params eval/checkpoint-best/render should use: the Polyak
    EMA shadow when train.param_ema is on, else the live params."""
    return state.params if state.ema is None else state.ema


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))
