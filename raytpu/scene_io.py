"""Scene file I/O — JSON scene descriptions for the CLI and tools.

The reference hardcodes its worlds in C++ (CSVersion/DxCSApp.cpp:72-157)
with no loader.  This rounds out the config story (SURVEY.md §5): a
human-editable JSON schema that round-trips a Scene exactly.

Schema::

    {"spheres": [
        {"center": [x, y, z], "radius": r,
         "material": "diffuse" | "metal" | "dielectric",
         "albedo": [r, g, b],        # optional, default [0.5, 0.5, 0.5]
         "param": f}                 # metal fuzz or dielectric IOR
    ]}

Unknown top-level keys are ignored (forward compatibility); unknown
material names raise.
"""

from __future__ import annotations

import json

import numpy as np

from raytpu.scene import Scene, make_scene, DIFFUSE, METAL, DIELECTRIC

_MAT_NAMES = {"diffuse": DIFFUSE, "metal": METAL,
              "dielectric": DIELECTRIC}
_MAT_IDS = {v: k for k, v in _MAT_NAMES.items()}


def scene_to_dict(scene: Scene) -> dict:
    out = []
    for i in range(scene.count):
        out.append({
            "center": [float(v) for v in np.asarray(scene.center[i])],
            "radius": float(scene.radius[i]),
            "material": _MAT_IDS[int(scene.mat_type[i])],
            "albedo": [float(v) for v in np.asarray(scene.albedo[i])],
            "param": float(scene.mat_param[i]),
        })
    return {"spheres": out}


def scene_from_dict(d: dict) -> Scene:
    spheres = []
    for i, s in enumerate(d["spheres"]):
        name = s.get("material", "diffuse")
        if name not in _MAT_NAMES:
            raise ValueError(
                f"sphere {i}: unknown material {name!r} "
                f"(expected one of {sorted(_MAT_NAMES)})")
        spheres.append((
            tuple(float(v) for v in s["center"]),
            float(s["radius"]),
            _MAT_NAMES[name],
            tuple(float(v) for v in s.get("albedo", (0.5, 0.5, 0.5))),
            float(s.get("param", 0.0)),
        ))
    if not spheres:
        raise ValueError("scene has no spheres")
    return make_scene(spheres)


def save_scene(path: str, scene: Scene) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f, indent=1)
        f.write("\n")


def load_scene(path: str) -> Scene:
    with open(path) as f:
        return scene_from_dict(json.load(f))
