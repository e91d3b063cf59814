"""Command-line interface.

The reference has zero CLI — `int main()` takes no arguments
(main.cu:319) and every knob is a recompile.  Subcommands:

  tnerf train   --config cfg.json --override a.b=c ...
  tnerf render  --config cfg.json --checkpoint dir --pose-index 0 --out img.png
  tnerf eval    --config cfg.json --checkpoint dir
  tnerf suite   --scenes chair,drums,...      (batch test-set evaluation)
  tnerf mesh    --config cfg.json --checkpoint dir --out mesh.obj
  tnerf config  [--config cfg.json]           (print the resolved config)

Benchmarks are a repo-level driver (`python bench.py`, one JSON line),
not a subcommand — they need the committed gate runs/ checkpoints.
"""

from __future__ import annotations

import argparse
import json
import sys

from tnerf.config import Config


def _load_cfg(args) -> Config:
    cfg = Config.from_json_file(args.config) if args.config else Config()
    if args.override:
        cfg = cfg.apply_overrides(args.override)
    if getattr(args, "out", None) and args.cmd == "train":
        cfg = cfg.apply_overrides([f"logging.out_dir={args.out}"])
    return cfg


def _ray_compact_guard(cfg: Config):
    """(eligible, pool_res_override) for the ray-compaction capacity
    guard; eligible=False when the configured pipeline never takes the
    ray-compacted path.

    The keep rule is PIPELINE-specific: the fused renderer pools at
    min(render.fused_coarse_res, res) (pallas_fused2 res_c) whenever
    tighten is on — the override tells ray_keep_fraction to use that
    pooling.  The march
    renderer only compacts on the kernel-eligible configs (eval-time
    tighten with t_res <= 32 and a mask resolution no coarser —
    grid_renderer use_kernel); there the override stays None so
    ray_keep_fraction derives the march pooling AND the CDF-fold probe
    count itself (passing an explicit pool_res would suppress its
    cdf_bins keep-rule mirror).  Guarding with the wrong pooling either
    misses real over-capacity drops or warns for a path that never
    runs."""
    if not cfg.render.ray_compact:
        return False, None
    res = cfg.grid.resolution
    t_res = min(cfg.sampler.tighten_res or res, res)
    m_res = min(cfg.sampler.occupancy_mask_res or res, res)
    if cfg.render.pipeline == "fused" and cfg.render.fused_tighten:
        from tnerf.render.pallas_fused2 import (
            select_bin_pool_res,
            select_coarse_res,
        )

        # CDF placement: the keep rule is any(bins) from the res_t fold
        # (cdf_bins midpoints on the bin-probe pooling), NOT the
        # in-kernel coarse bitfield — guard at the pooling that actually
        # decides keeps (ray_keep_fraction switches to cdf_bins probes
        # when given an explicit pool under CDF placement)
        if cfg.sampler.placement == "occupancy_cdf":
            return True, select_bin_pool_res(res)
        return True, select_coarse_res(cfg.render, res)
    if (
        cfg.render.pipeline == "grid_march"
        and cfg.sampler.tighten
        and m_res >= t_res
        and t_res < res
        and t_res <= 32
    ):
        return True, None
    return False, None


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tnerf", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", help="JSON config file")
        sp.add_argument(
            "--override", "-o", action="append", default=[],
            help="config override key.path=value (repeatable)",
        )

    sp = sub.add_parser("train", help="train a radiance field")
    common(sp)
    sp.add_argument("--out", help="output directory (overrides logging.out_dir)")

    sp = sub.add_parser("render", help="render one view from a checkpoint")
    common(sp)
    sp.add_argument("--checkpoint", required=False, help="checkpoint dir (default: out_dir/checkpoints)")
    sp.add_argument("--pose-index", type=int, default=0)
    sp.add_argument("--split", default="test")
    sp.add_argument("--out", default="render.png")
    sp.add_argument(
        "--orbit", type=int, default=0, metavar="N",
        help="render N novel views on a circular orbit instead of a "
        "dataset pose; --out becomes a directory of orbit_###.png frames",
    )
    sp.add_argument(
        "--path", default=None, metavar="POSES_JSON",
        help="render a custom camera path: JSON list of 4x4 (or 3x4) "
        "c2w pose matrices, or {\"poses\": [...]}; --out becomes a "
        "directory of path_###.png frames (mutually exclusive with "
        "--orbit)",
    )
    sp.add_argument(
        "--channels", default="rgb", metavar="LIST",
        help="comma list of output channels: rgb, depth (expected-"
        "termination depth, inverted grayscale), acc (opacity).  With "
        "more than one channel, extras get a _depth/_acc suffix before "
        "the extension (render.png -> render_depth.png)",
    )
    sp.add_argument(
        "--orbit-elevation", type=float, default=None, metavar="RAD",
        help="orbit elevation in radians (default: the dataset cameras' "
        "mean elevation)",
    )
    sp.add_argument(
        "--gif", action="store_true",
        help="with --orbit: additionally assemble the frames into an "
        "animated <out>/orbit.gif (10 fps turntable)",
    )
    sp.add_argument(
        "--refined-poses", action="store_true",
        help="apply the checkpoint's learned pose delta to the rendered "
        "view (train.optimize_poses checkpoints, --split train only — "
        "the deltas are per-TRAIN-image)",
    )

    sp = sub.add_parser("eval", help="PSNR over the test split from a checkpoint")
    common(sp)
    sp.add_argument("--checkpoint", required=False)
    sp.add_argument(
        "--save-renders", default=None, metavar="DIR",
        help="also write each evaluated view's render as "
        "DIR/<split>_###.png",
    )

    sp = sub.add_parser(
        "suite",
        help="batch test-set evaluation over multiple scenes "
        "(BASELINE config 4); expects per-scene checkpoints under "
        "<out_dir>/<scene>/checkpoints",
    )
    common(sp)
    sp.add_argument(
        "--scenes",
        default="chair,drums,ficus,hotdog,lego,materials,mic,ship",
        help="comma-separated scene names",
    )

    sp = sub.add_parser(
        "mesh",
        help="extract an isosurface OBJ from a checkpoint (marching "
        "tetrahedra over the field's density; no dataset required)",
    )
    common(sp)
    sp.add_argument("--checkpoint", required=False)
    sp.add_argument("--out", default="mesh.obj")
    sp.add_argument(
        "--resolution", type=int, default=128,
        help="density sampling cells per AABB axis (vertex grid is N+1)",
    )
    sp.add_argument(
        "--threshold", type=float, default=None,
        help="density iso level (default: grid.density_threshold)",
    )
    sp.add_argument(
        "--vertex-colors", action="store_true",
        help="bake per-vertex RGB from the field (queried along the "
        "inward surface normal; written as the `v x y z r g b` OBJ "
        "vertex-color extension)",
    )

    sp = sub.add_parser(
        "bake",
        help="bake a trained field into a dense density+RGB grid for "
        "fast lookup-only rendering (SNeRG-style; see "
        "tnerf/render/baked.py)",
    )
    common(sp)
    sp.add_argument("--checkpoint", required=False)
    sp.add_argument(
        "--out", default=None,
        help="output npz (default <out_dir>/baked/baked_<res>.npz)",
    )
    sp.add_argument(
        "--bake-res", type=int, default=256,
        help="vertex-grid resolution per axis (memory: res^3 * 16 B)",
    )
    sp.add_argument(
        "--mode", default="trilinear_brick",
        choices=("nearest", "trilinear", "trilinear_brick"),
        help="lookup mode the --eval render uses (the npz always stores "
        "the unpacked [R^3,4] table; brick packing happens at load)",
    )
    sp.add_argument(
        "--eval", action="store_true",
        help="evaluate the baked render over the test split and write "
        "<out_dir>/baked_parity.json: baked PSNR vs the config's own "
        "direct (march) render of the same checkpoint",
    )

    sp = sub.add_parser("config", help="print resolved config JSON")
    common(sp)
    sp.add_argument(
        "--diff", action="store_true",
        help="print only the overrides that differ from defaults "
        "(one section.key=value per line, re-usable as -o flags)",
    )

    args = p.parse_args(argv)

    if args.cmd == "config":
        cfg = _load_cfg(args)
        if args.diff:
            for line in cfg.diff_overrides():
                print(line)
        else:
            print(cfg.to_json())
        return 0

    cfg = _load_cfg(args)

    if args.cmd == "train":
        from tnerf.train_loop import run_training

        metrics = run_training(cfg)
        print(json.dumps(metrics, indent=2))
        return 0

    if args.cmd == "suite":
        return _run_suite(cfg, args.scenes.split(","))

    if args.cmd == "mesh":
        # No dataset needed: the field + checkpoint fully determine the
        # density; sampling happens in AABB (world) coordinates.
        import os

        import jax
        import jax.numpy as jnp

        from tnerf.grid.marching import extract_density_mesh, save_obj

        n_train = 0
        if cfg.train.optimize_poses:
            # a pose-opt checkpoint carries the [N_train, 6] delta leaf;
            # the restore template needs N_train, so load the train split
            from tnerf.data.dataset import load_data, scene_proc_kwargs

            ds = load_data(
                cfg.scene.kind, cfg.scene.name, root=cfg.scene.root,
                srgb_to_linear=cfg.scene.srgb_to_linear,
                downscale=cfg.scene.downscale, splits=("train",),
                proc=scene_proc_kwargs(cfg.scene),
            )
            n_train = len(ds["train"])
        ckpt_dir = args.checkpoint or os.path.join(
            cfg.logging.out_dir, "checkpoints"
        )
        field, state, occ, step, err = _build_restore(cfg, ckpt_dir, n_train)
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 1
        print(f"restored step {step} from {ckpt_dir}", file=sys.stderr)
        from tnerf.train import eval_params

        ep = eval_params(state)
        density = jax.jit(field.density)
        verts, faces = extract_density_mesh(
            lambda x: density(ep, jnp.asarray(x)),
            cfg.grid, resolution=args.resolution, level=args.threshold,
        )
        if faces.shape[0] == 0:
            print(
                "error: empty isosurface — is --threshold above the "
                "field's max density?", file=sys.stderr,
            )
            return 1
        colors = None
        if args.vertex_colors:
            import numpy as np

            from tnerf.grid.marching import vertex_normals

            # view each vertex along the INWARD normal (a camera outside
            # looking at the surface) — the standard appearance bake
            nrm = vertex_normals(verts, faces)
            apply_fn = jax.jit(field.apply)
            chunk = 1 << 16
            cols = []
            for s in range(0, len(verts), chunk):
                rgb, _ = apply_fn(
                    ep,
                    jnp.asarray(verts[s : s + chunk]),
                    jnp.asarray(-nrm[s : s + chunk]),
                )
                cols.append(np.asarray(rgb))
            colors = np.concatenate(cols)
        save_obj(args.out, verts, faces, colors)
        tag = " (vertex colors)" if colors is not None else ""
        print(f"wrote {args.out}: {len(verts)} vertices, {len(faces)} faces{tag}")
        return 0

    # render / eval need a restored state
    import os

    import jax

    from tnerf.data.dataset import (
        load_data,
        scene_llff_kwargs,
        scene_proc_kwargs,
        validate_scene_background,
    )
    from tnerf.grid.occupancy import renderer_payload
    from tnerf.train import eval_params
    from tnerf.train_loop import (
        build_renderer,
        ndc_near_or_none,
        resolve_near_far,
        validate_ndc,
    )

    # data first: sampler.near/far = -1 (auto) resolves from the
    # dataset's depth bounds BEFORE any renderer is built
    validate_scene_background(cfg.scene.kind, cfg.scene.name, cfg.scene.white_background)
    validate_ndc(cfg)
    datasets = load_data(
        cfg.scene.kind, cfg.scene.name, root=cfg.scene.root,
        srgb_to_linear=cfg.scene.srgb_to_linear, downscale=cfg.scene.downscale,
        proc=scene_proc_kwargs(cfg.scene), llff=scene_llff_kwargs(cfg.scene),
    )
    cfg = resolve_near_far(cfg, next(iter(datasets.values())))
    ndc = ndc_near_or_none(cfg)
    ckpt_dir = args.checkpoint or os.path.join(cfg.logging.out_dir, "checkpoints")
    field, state, occ, step, err = _build_restore(
        cfg, ckpt_dir, len(datasets["train"])
    )
    if err:
        print(f"error: {err}", file=sys.stderr)
        return 1
    print(f"restored step {step} from {ckpt_dir}", file=sys.stderr)
    # `bits` (bool) feeds the capacity guards; `payload` is what the
    # renderers consume (density EMA under density_cdf placement).
    bits = occ.bitfield if occ is not None else None
    payload = renderer_payload(occ, cfg.sampler, cfg.grid)

    if args.cmd == "bake":
        # handled BEFORE the config renderer + compaction guards are
        # built: baking needs only the field (its own march renderer is
        # constructed inside the branch), and e.g. a fused-pipeline
        # validation error must not abort a bake that never runs the
        # fused path.
        return _run_bake(args, cfg, field, state, occ, payload, bits,
                         datasets, step, ndc)

    renderer = build_renderer(cfg, field, for_eval=True)
    # Capacity guard: the keep fraction depends on the RESTORED
    # occupancy (trained EMA grids are much fatter than analytic
    # ones); kept rays beyond ray_compact_fraction silently render
    # as background.  One cheap XLA pass over a probe view.  The keep
    # rule is pipeline-specific: fused pools at
    # min(render.fused_coarse_res, res) (pallas_fused2 res_c); march
    # pools at sampler.tighten_res but
    # only takes the compacted path on the kernel-eligible configs —
    # for anything else the renderer never compacts, so no guard.
    guard_on, guard_pool = (
        _ray_compact_guard(cfg) if bits is not None and step > 0
        else (False, None)
    )
    cdf_guard = (
        bits is not None
        and step > 0
        and cfg.sampler.placement in ("occupancy_cdf", "density_cdf")
        and cfg.render.compact
        and cfg.render.pipeline == "grid_march"
    )
    if guard_on or cdf_guard:
        from tnerf.cameras import camera_rays, ndc_warp

        ds0 = next(iter(datasets.values()))
        probe_rays = camera_rays(
            jax.numpy.asarray(ds0.poses[0]), ds0.width, ds0.height,
            ds0.camera, cfg.scene.scene_scale,
        )
        if ndc is not None:
            probe_rays = ndc_warp(
                probe_rays, ds0.width, ds0.height, ds0.camera, ndc
            )
    kf = 1.0
    if guard_on:
        from tnerf.render.grid_renderer import ray_keep_fraction

        kf = ray_keep_fraction(
            probe_rays, bits, cfg.grid, cfg.sampler, pool_res=guard_pool
        )
        if kf > cfg.render.ray_compact_fraction:
            print(
                f"WARNING: ray-compaction keep fraction {kf:.3f} on the "
                f"probe view exceeds render.ray_compact_fraction="
                f"{cfg.render.ray_compact_fraction} — over-capacity rays "
                f"will render as background. Raise the fraction (or set "
                f"render.ray_compact=false).",
                file=sys.stderr,
            )
    if cdf_guard:
        # Sample-compaction capacity under occupancy-CDF placement: the
        # occupied-SAMPLE fraction is by design much higher than the
        # cell occupancy the uniform presets sized compact_fraction for.
        from tnerf.render.grid_renderer import cdf_occupied_sample_fraction

        sf = float(cdf_occupied_sample_fraction(
            probe_rays, payload, cfg.grid, cfg.sampler
        ))
        needed = sf / max(kf, 1e-6) if guard_on else sf
        if needed > cfg.render.compact_fraction:
            print(
                f"WARNING: occupancy-CDF occupied-sample fraction "
                f"{needed:.3f} (probe view, per kept ray) exceeds "
                f"render.compact_fraction={cfg.render.compact_fraction}"
                f" — over-capacity samples will be dropped. Raise the "
                f"fraction (or set render.compact=false).",
                file=sys.stderr,
            )

    # Multi-device eval rendering: shard rays across a data-parallel mesh
    # when more than one device is visible (same layout as training DP).
    mesh = None
    n_dp = cfg.parallel.data_parallel
    n_dp = len(jax.devices()) if n_dp == -1 else n_dp
    if n_dp > 1:
        from tnerf.parallel.mesh import make_mesh

        mesh = make_mesh(n_dp, cfg.parallel.axis_name)

    if args.cmd == "render":
        from tnerf.data.png_io import write_png
        from tnerf.eval import acc_image, depth_image

        ds = datasets[args.split]
        # --channels applies to BOTH the dataset-pose and --orbit paths;
        # validate before either branch so a typo never exits 0 with
        # silently-wrong output.
        channels = [c.strip() for c in args.channels.split(",") if c.strip()]
        bad = [c for c in channels if c not in ("rgb", "depth", "acc")]
        if bad or not channels:
            print(f"error: unknown --channels {bad or args.channels!r} "
                  "(choose from rgb, depth, acc)", file=sys.stderr)
            return 1

        def channel_image(res, ch):
            return {
                "rgb": lambda: res.rgb,
                # single-image depth keeps per-image auto exposure; the
                # orbit/path sequence path exposes globally instead
                "depth": lambda: depth_image(res.depth, res.acc),
                "acc": lambda: acc_image(res.acc),
            }[ch]()

        if args.orbit > 0 and args.path:
            print("error: --orbit and --path are mutually exclusive",
                  file=sys.stderr)
            return 1
        if args.orbit > 0 and ndc is not None:
            print(
                "error: --orbit renders a full turntable, but scene.ndc "
                "only covers the forward-facing frustum — render a "
                "forward-facing sequence with --path poses.json instead",
                file=sys.stderr,
            )
            return 1
        seq_poses, seq_tag = None, "orbit"
        if args.orbit > 0:
            import numpy as np

            from tnerf.data.procedural import orbit_poses

            # orbit at the dataset cameras' mean radius/elevation so the
            # novel path stays inside the trained view distribution
            eyes = np.asarray(ds.poses)[:, :3, 3]
            radius = float(np.linalg.norm(eyes, axis=1).mean())
            elev = (
                args.orbit_elevation
                if args.orbit_elevation is not None
                else float(np.arcsin(
                    np.clip(eyes[:, 2] / np.maximum(
                        np.linalg.norm(eyes, axis=1), 1e-9), -1, 1)
                ).mean())
            )
            seq_poses = list(orbit_poses(args.orbit, radius, elev))
        elif args.path:
            import numpy as np

            # custom camera path: a JSON list of 4x4 (or 3x4) c2w pose
            # matrices, or {"poses": [...]} — same convention as the
            # dataset transforms
            seq_tag = "path"
            try:
                with open(args.path) as fh:
                    d = json.load(fh)
            except (OSError, ValueError) as e:
                print(f"error: cannot read poses from {args.path}: {e}",
                      file=sys.stderr)
                return 1
            pose_list = d.get("poses") if isinstance(d, dict) else d
            if not isinstance(pose_list, list):
                print(f"error: {args.path} must be a JSON list of poses "
                      "or {\"poses\": [...]}", file=sys.stderr)
                return 1
            seq_poses = []
            for i, p in enumerate(pose_list):
                try:
                    m = np.asarray(p, np.float32)
                except (ValueError, TypeError):
                    m = np.zeros((0,), np.float32)  # ragged -> shape error below
                if m.shape == (3, 4):
                    m = np.concatenate(
                        [m, np.asarray([[0, 0, 0, 1]], np.float32)]
                    )
                if m.shape != (4, 4):
                    print(f"error: pose {i} in {args.path} has shape "
                          f"{m.shape}; expected 4x4 or 3x4 c2w",
                          file=sys.stderr)
                    return 1
                seq_poses.append(m)
            if not seq_poses:
                print(f"error: {args.path} contains no poses",
                      file=sys.stderr)
                return 1
        if seq_poses is not None:
            import numpy as np

            from tnerf.cameras import camera_rays
            from tnerf.data.png_io import write_png_batch
            from tnerf.render.renderer import render_image

            os.makedirs(args.out, exist_ok=True)
            # Non-depth channels convert per frame (no need to hold the
            # full RenderResult for the whole sequence); depth keeps raw
            # (depth, acc) planes because its exposure is a second,
            # global pass.
            frames = {ch: [] for ch in channels}
            depth_raw = []
            for pose in seq_poses:
                rays = camera_rays(
                    jax.numpy.asarray(pose), ds.width, ds.height,
                    ds.camera, cfg.scene.scene_scale,
                )
                if ndc is not None:
                    from tnerf.cameras import ndc_warp

                    rays = ndc_warp(rays, ds.width, ds.height, ds.camera, ndc)
                res = render_image(
                    renderer, eval_params(state), rays,
                    chunk_size=cfg.render.chunk_size, occupancy=payload,
                    mesh=mesh,
                )
                res = jax.device_get(res)
                for ch in channels:
                    if ch != "depth":
                        frames[ch].append(np.asarray(channel_image(res, ch)))
                if "depth" in channels:
                    depth_raw.append((
                        np.asarray(res.depth, np.float32),
                        np.asarray(res.acc, np.float32),
                    ))
            if "depth" in channels:
                # ONE depth exposure across the whole sequence: per-frame
                # auto-exposure stretches each frame's own hit-depth
                # range to full contrast, so the same world depth maps to
                # different grays frame-to-frame and the turntable
                # flickers.  hit_depths is the same normalization
                # depth_image applies.
                from tnerf.eval import hit_depths

                t_all = []
                for dep, acc in depth_raw:
                    hit, th = hit_depths(dep, acc)
                    if hit.any():
                        t_all.append((float(th[hit].min()),
                                      float(th[hit].max())))
                depth_range = (
                    (min(n for n, _ in t_all), max(f for _, f in t_all))
                    if t_all else (0.0, 1.0)
                )
                frames["depth"] = [
                    np.asarray(depth_image(
                        dep, acc, near=depth_range[0], far=depth_range[1]
                    ))
                    for dep, acc in depth_raw
                ]
            for ch in channels:
                # rgb keeps the bare <tag>_###.png names; extra channels
                # get a suffix, mirroring the dataset-pose naming
                suffix = "" if ch == "rgb" or len(channels) == 1 else f"_{ch}"
                paths = [
                    os.path.join(args.out, f"{seq_tag}_{i:03d}{suffix}.png")
                    for i in range(len(seq_poses))
                ]
                write_png_batch(paths, np.stack(frames[ch]))
            print(f"wrote {len(seq_poses)} {seq_tag} frames "
                  f"({','.join(channels)}) to {args.out}/")
            if args.gif:
                from PIL import Image

                # the turntable gif animates rgb when requested, else
                # the first listed channel
                gif_ch = "rgb" if "rgb" in channels else channels[0]
                u8 = [
                    Image.fromarray(
                        (np.clip(f, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                    )
                    for f in frames[gif_ch]
                ]
                gif = os.path.join(args.out, f"{seq_tag}.gif")
                u8[0].save(
                    gif, save_all=True, append_images=u8[1:],
                    duration=100, loop=0,
                )
                print(f"wrote {gif}")
            return 0
        from tnerf.eval import render_dataset_view_result

        pose_delta = None
        if args.refined_poses:
            if "pose_deltas" not in state.params:
                print(
                    "error: --refined-poses needs a train.optimize_poses "
                    "checkpoint (no pose_deltas leaf restored)",
                    file=sys.stderr,
                )
                return 1
            if args.split != "train":
                print(
                    "error: --refined-poses applies per-TRAIN-image "
                    f"deltas; --split {args.split} poses were never "
                    "refined",
                    file=sys.stderr,
                )
                return 1
            pose_delta = eval_params(state)["pose_deltas"][args.pose_index]
        res = render_dataset_view_result(
            renderer, eval_params(state), ds, args.pose_index, cfg.scene.scene_scale,
            chunk_size=cfg.render.chunk_size, occupancy=payload, mesh=mesh,
            pose_delta=pose_delta, ndc_near=ndc,
        )
        base, ext = os.path.splitext(args.out)
        for ch in channels:
            img = channel_image(res, ch)
            path = (
                args.out
                if ch == "rgb" or len(channels) == 1
                else f"{base}_{ch}{ext or '.png'}"
            )
            write_png(path, img)
            print(f"wrote {path}")
        return 0

    # eval
    from tnerf.eval import evaluate

    out = {}
    for split in ("val", "test"):
        if split in datasets:
            out.update(
                evaluate(
                    renderer, eval_params(state), datasets[split], cfg.scene.scene_scale,
                    white_background=cfg.scene.white_background,
                    save_dir=args.save_renders,
                    chunk_size=cfg.render.chunk_size, occupancy=payload, mesh=mesh,
                    ndc_near=ndc,
                )
            )
    print(json.dumps(out, indent=2))
    return 0


def _build_restore(cfg, ckpt_dir, n_train_images):
    """The one checkpoint-restore scaffold every subcommand shares:
    build the field + optimizer + (state, occ) template — including the
    optional pose-delta / freq_alpha leaves (pose_extra_params), which a
    matching checkpoint carries — and restore from ckpt_dir.  Returns
    (field, state, occ, step, err)."""
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.train import create_optimizer, init_train_state, pose_extra_params
    from tnerf.train_loop import build_field

    field = build_field(cfg)
    optimizer = create_optimizer(cfg.train)
    state = init_train_state(
        field, optimizer, cfg.train.seed,
        pose_extra_params(cfg, n_train_images),
        param_ema=cfg.train.param_ema > 0,
    )
    occ = (
        init_occupancy(cfg.grid)
        if cfg.render.pipeline != "uniform" else None
    )
    step, state, occ, err = _restore_state(ckpt_dir, state, occ)
    return field, state, occ, step, err


def _restore_state(ckpt_dir, state, occ):
    """Restore (state, occ) with a state-only fallback: fused-pipeline
    checkpoints written before round 3 carried no occupancy grid (the
    pipeline gained the (state, occ) payload when it became
    occupancy-aware — see docs/MIGRATION.md); those restore into a
    state-only template and keep the freshly-initialized (dense) grid."""
    import sys

    from tnerf.utils.checkpoint import restore_checkpoint

    template = (state, occ) if occ is not None else state
    try:
        restored = restore_checkpoint(ckpt_dir, template)
    except ValueError as e:
        if occ is None:
            raise
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is None:
            return 0, state, occ, f"no checkpoint found in {ckpt_dir}"
        step, state = restored
        print(
            f"restored step {step} from {ckpt_dir} (legacy state-only "
            f"checkpoint — occupancy grid left dense; {e})",
            file=sys.stderr,
        )
        return step, state, occ, None
    if restored is None:
        return 0, state, occ, f"no checkpoint found in {ckpt_dir}"
    step, payload = restored
    if occ is not None:
        state, occ = payload
    else:
        state = payload
    return step, state, occ, None


def _run_bake(args, cfg, field, state, occ, payload, bits, datasets,
              step, ndc) -> int:
    """`tnerf bake`: evaluate the restored field into a dense [R^3,4]
    grid (tnerf/render/baked.py), save the npz, and with --eval compare
    the baked lookup render against the config's direct march render of
    the same checkpoint over the test split (baked_parity.json)."""
    import os
    import time as _time

    import numpy as np

    from tnerf.eval import evaluate
    from tnerf.render.baked import bake_field, make_baked_renderer
    from tnerf.train import eval_params
    from tnerf.train_loop import build_renderer

    ep = eval_params(state)
    t0 = _time.perf_counter()
    table = bake_field(
        field, ep, cfg.grid, bake_res=args.bake_res, occupancy=bits,
    )
    table.block_until_ready()
    bake_s = _time.perf_counter() - t0
    out_npz = args.out or os.path.join(
        cfg.logging.out_dir, "baked", f"baked_{args.bake_res}.npz"
    )
    os.makedirs(os.path.dirname(out_npz) or ".", exist_ok=True)
    np.savez_compressed(
        out_npz, table=np.asarray(table, np.float16),
        bake_res=args.bake_res,
    )
    print(
        f"baked {args.bake_res}^3 grid in {bake_s:.1f}s -> {out_npz} "
        f"({os.path.getsize(out_npz) / 1e6:.0f} MB)", file=sys.stderr,
    )
    if not args.eval:
        return 0
    test = datasets["test"]
    brend = make_baked_renderer(
        table, args.bake_res, cfg.grid, cfg.sampler, cfg.render,
        mode=args.mode,
    )
    mb = evaluate(
        brend, brend.params, test, cfg.scene.scene_scale,
        white_background=cfg.scene.white_background,
        chunk_size=cfg.render.chunk_size, occupancy=payload,
        ndc_near=ndc,
    )
    # direct render of the same checkpoint at the config's own (march)
    # quadrature — the parity reference
    dcfg = cfg.apply_overrides(["render.pipeline=grid_march"])
    drend = build_renderer(dcfg, field, for_eval=True)
    md = evaluate(
        drend, ep, test, cfg.scene.scene_scale,
        white_background=cfg.scene.white_background,
        chunk_size=cfg.render.chunk_size, occupancy=payload,
        ndc_near=ndc,
    )
    art = {
        "bake_res": args.bake_res, "mode": args.mode,
        "bake_seconds": round(bake_s, 1),
        "baked": {k: round(float(v), 4) for k, v in mb.items()},
        "march": {k: round(float(v), 4) for k, v in md.items()},
        "parity_db": round(
            abs(float(md["psnr_test"]) - float(mb["psnr_test"])), 4
        ),
        "checkpoint_step": step,
    }
    ppath = os.path.join(cfg.logging.out_dir, "baked_parity.json")
    with open(ppath, "w") as fh:
        json.dump(art, fh, indent=2)
    print(json.dumps(art, indent=2))
    return 0


def _run_suite(cfg, scenes) -> int:
    """Evaluate the test split of each scene from its checkpoint and print
    a summary table (BASELINE config 4)."""
    import os

    from tnerf.data.dataset import (
        load_data,
        scene_llff_kwargs,
        scene_proc_kwargs,
        validate_scene_background,
    )
    from tnerf.eval import evaluate
    from tnerf.grid.occupancy import renderer_payload
    from tnerf.train import eval_params
    from tnerf.train_loop import (
        build_renderer,
        ndc_near_or_none,
        resolve_near_far,
        validate_ndc,
    )

    results = {}
    for scene in scenes:
        scene = scene.strip()
        scfg = cfg.apply_overrides([
            f"scene.name={scene}",
            f"logging.out_dir={os.path.join(cfg.logging.out_dir, scene)}",
        ])
        try:
            validate_scene_background(scfg.scene.kind, scfg.scene.name, scfg.scene.white_background)
            validate_ndc(scfg)
            # pose-opt checkpoints carry a per-TRAIN-image delta leaf;
            # the restore template needs the train split's size too
            splits = (
                ("train", "test") if scfg.train.optimize_poses
                else ("test",)
            )
            datasets = load_data(
                scfg.scene.kind, scene, root=scfg.scene.root,
                srgb_to_linear=scfg.scene.srgb_to_linear,
                downscale=scfg.scene.downscale, splits=splits,
                proc=scene_proc_kwargs(scfg.scene),
                llff=scene_llff_kwargs(scfg.scene),
            )
        except (FileNotFoundError, ValueError) as e:
            print(f"{scene}: SKIP (no data: {e})", file=sys.stderr)
            continue
        scfg = resolve_near_far(scfg, datasets["test"])
        ckpt_dir = os.path.join(scfg.logging.out_dir, "checkpoints")
        field, state, occ, _, err = _build_restore(
            scfg, ckpt_dir,
            len(datasets["train"]) if "train" in datasets else 0,
        )
        renderer = build_renderer(scfg, field, compact=False, for_eval=True)
        if err:
            print(f"{scene}: SKIP ({err})", file=sys.stderr)
            continue
        payload = renderer_payload(occ, scfg.sampler, scfg.grid)
        results[scene] = evaluate(
            renderer, eval_params(state), datasets["test"], scfg.scene.scene_scale,
            white_background=scfg.scene.white_background,
            save_dir=os.path.join(scfg.logging.out_dir, "suite_renders"),
            chunk_size=scfg.render.chunk_size, occupancy=payload,
            ndc_near=ndc_near_or_none(scfg),
        )
        print(f"{scene}: {results[scene]}", file=sys.stderr)
    if results:
        mean_psnr = sum(r["psnr_test"] for r in results.values()) / len(results)
        print(json.dumps({"scenes": results, "mean_psnr_test": mean_psnr}, indent=2))
        return 0
    print("error: no scene produced results", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
