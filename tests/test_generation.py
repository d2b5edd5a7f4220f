"""BL30K scene generator: structure, determinism, path separation."""
import json
import os

import numpy as np
import numpy.polynomial.polynomial as npoly

from mivos_tpu.generation.bl30k import (SceneConfig, SceneGenerator,
                                        paths_separated)

OBJS = [f"obj{i}" for i in range(10)]
TEXS = [f"tex{i}.jpg" for i in range(5)]


def make_gen(seed=0, **kw):
    return SceneGenerator(SceneConfig(**kw), OBJS, TEXS,
                          is_mapped=lambda n: n.endswith("0"), seed=seed)


class TestSceneGenerator:
    def test_scene_structure(self):
        d = make_gen().scene(3)
        modules = [m["module"] for m in d["modules"]]
        assert modules[0] == "main.Initializer"
        assert "camera.CameraTrajectoryRunner" in modules
        n_obj = modules.count("object.ObjectTrajectoryRunner")
        assert 3 <= n_obj <= 5
        assert 1 <= modules.count("lighting.LightRunner") <= 3
        assert modules[-1] == "writer.RGBSegWriter"
        cam = next(m for m in d["modules"]
                   if m["module"] == "camera.CameraTrajectoryRunner")
        loc = np.asarray(cam["config"]["cam_poses"]["location_poly"])
        assert loc.shape == (5, 3)  # degree-4 polynomial coefficients

    def test_deterministic_per_scene_id(self):
        a = make_gen(seed=7).scene(11)
        b = make_gen(seed=7).scene(11)
        assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)
        c = make_gen(seed=7).scene(12)
        assert json.dumps(a, sort_keys=True) != json.dumps(c, sort_keys=True)

    def test_object_paths_separated(self):
        d = make_gen(seed=1).scene(0)
        polys = [np.asarray(m["config"]["location_poly"])
                 for m in d["modules"]
                 if m["module"] == "object.ObjectTrajectoryRunner"]
        t = np.linspace(0, 1, 256)
        for i in range(len(polys)):
            for j in range(i + 1, len(polys)):
                a = npoly.polyval(t, polys[i])
                b = npoly.polyval(t, polys[j])
                dmin = np.min(np.linalg.norm(a - b, axis=0))
                assert dmin > 0.5, (i, j, dmin)

    def test_paths_separated_helper(self):
        p1 = np.zeros((5, 3))
        p2 = np.zeros((5, 3))
        p2[0] = [0.1, 0.1, 0.1]   # nearly identical constant path
        assert not paths_separated([p1], p2, tol=0.75)
        p3 = np.zeros((5, 3))
        p3[0] = [5.0, 5.0, 5.0]
        assert paths_separated([p1], p3, tol=0.75)

    def test_write_files(self, tmp_path):
        files = make_gen().write(str(tmp_path), start=5, count=3)
        assert len(files) == 3
        assert all(os.path.exists(f) for f in files)
