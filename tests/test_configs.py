"""Every shipped preset must load, round-trip through JSON, and build
its field + renderer — guards config-schema drift (a new dataclass field
or renamed knob that silently breaks a committed preset).  Construction
only: no compile, no data."""

import glob
import json
import os

import pytest

from tnerf.config import Config

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "configs", "*.json")
))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_shipped_config_loads_and_builds(path):
    from tnerf.train_loop import build_field, build_renderer

    cfg = Config.from_json_file(path)
    # JSON round-trip is lossless
    assert Config.from_dict(json.loads(cfg.to_json())) == cfg
    field = build_field(cfg)
    renderer = build_renderer(cfg, field, for_eval=True)
    assert callable(renderer)


def test_config_rejects_unknown_key(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"sampler": {"samples_per_rayy": 8}}))
    with pytest.raises(ValueError, match="samples_per_rayy"):
        Config.from_json_file(str(p))
    p.write_text(json.dumps({"samplerr": {}}))
    with pytest.raises(ValueError, match="samplerr"):
        Config.from_json_file(str(p))


def test_diff_overrides_roundtrip_all_presets():
    """Config.diff_overrides is the minimal reproduction recipe: applying
    it to defaults must rebuild every shipped preset exactly, and the
    default config must diff to nothing."""
    import glob

    from tnerf.config import Config

    assert Config().diff_overrides() == []
    for path in sorted(glob.glob("configs/*.json")):
        cfg = Config.from_json_file(path)
        again = Config().apply_overrides(cfg.diff_overrides())
        assert again == cfg, path


def test_diff_overrides_tuple_has_no_spaces():
    """Tuple values must render without spaces: the --diff output is
    documented as re-usable unquoted -o flags, and a space would split
    the line into multiple shell tokens."""
    from tnerf.config import Config

    cfg = Config().apply_overrides(['grid.aabb_min=[-1.5,-1.5,-1.5]'])
    (line,) = cfg.diff_overrides()
    assert line == "grid.aabb_min=[-1.5,-1.5,-1.5]"
    assert " " not in line
    assert Config().apply_overrides([line]) == cfg
