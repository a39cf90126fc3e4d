"""JSON scene round-trip + CLI --scene-file."""

import numpy as np

import raytpu
from raytpu.scene_io import save_scene, load_scene, scene_from_dict
import pytest


def test_round_trip(tmp_path):
    scene = raytpu.random_world(half_extent=3)
    p = tmp_path / "scene.json"
    save_scene(str(p), scene)
    back = load_scene(str(p))
    for k in ("center", "radius", "albedo", "mat_param"):
        np.testing.assert_array_equal(np.asarray(getattr(scene, k)),
                                      np.asarray(getattr(back, k)))
    np.testing.assert_array_equal(np.asarray(scene.mat_type),
                                  np.asarray(back.mat_type))


def test_defaults_and_errors():
    s = scene_from_dict({"spheres": [
        {"center": [0, 0, -1], "radius": 0.5, "material": "diffuse"}]})
    assert s.count == 1
    np.testing.assert_allclose(np.asarray(s.albedo[0]), [0.5, 0.5, 0.5])
    with pytest.raises(ValueError, match="unknown material"):
        scene_from_dict({"spheres": [
            {"center": [0, 0, 0], "radius": 1, "material": "plasma"}]})
    with pytest.raises(ValueError, match="no spheres"):
        scene_from_dict({"spheres": []})


def test_cli_scene_file(tmp_path):
    import sys
    from raytpu.cli import main
    scene = raytpu.test_world()
    p = tmp_path / "s.json"
    save_scene(str(p), scene)
    out = tmp_path / "o.ppm"
    rc = main(["render", "--scene-file", str(p), "--width", "64",
               "--height", "32", "--spp", "1", "--depth", "2",
               "--backend", "golden", "--out", str(out)])
    assert rc == 0 and out.exists()
    # identical to building the scene in-process
    ref = tmp_path / "r.ppm"
    main(["render", "--scene", "test", "--width", "64", "--height", "32",
          "--spp", "1", "--depth", "2", "--backend", "golden",
          "--out", str(ref)])
    assert out.read_bytes() == ref.read_bytes()
