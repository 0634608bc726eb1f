"""Native host kernels — builds host_ops.cpp on first import.

The TPU compute path never touches these; they replace the reference's
Cython host layer (operator_py/cython, built by the reference Makefile) for
host-side eval and data tooling. Falls back to numpy implementations when
no compiler is available (`NATIVE` is then False).
"""
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
NATIVE = False
cpu_nms = cpu_soft_nms = bbox_overlaps = rasterize_polygons = None


def _so_path():
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, "host_ops" + suffix)


def build(force=False):
    """Compile host_ops.cpp into this directory (g++, CPython C API)."""
    so = _so_path()
    src = os.path.join(_DIR, "host_ops.cpp")
    if os.path.exists(so) and not force \
            and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    import numpy as np
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include_py}", f"-I{include_np}", src, "-o", so]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def _load():
    global NATIVE, cpu_nms, cpu_soft_nms, bbox_overlaps, rasterize_polygons
    try:
        build()
        import importlib.util
        spec = importlib.util.spec_from_file_location("host_ops", _so_path())
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cpu_nms = mod.cpu_nms
        cpu_soft_nms = mod.cpu_soft_nms
        bbox_overlaps = mod.bbox_overlaps
        rasterize_polygons = mod.rasterize_polygons
        NATIVE = True
    except Exception:  # pragma: no cover - compiler missing
        import numpy as np

        def cpu_nms(dets, thresh):  # noqa: F811
            d = np.asarray(dets, np.float32)
            order = np.argsort(-d[:, 4], kind="stable")
            keep, suppressed = [], np.zeros(len(d), bool)
            for i in order:
                if suppressed[i]:
                    continue
                keep.append(int(i))
                xx1 = np.maximum(d[i, 0], d[:, 0])
                yy1 = np.maximum(d[i, 1], d[:, 1])
                xx2 = np.minimum(d[i, 2], d[:, 2])
                yy2 = np.minimum(d[i, 3], d[:, 3])
                iw = np.maximum(xx2 - xx1 + 1, 0)
                ih = np.maximum(yy2 - yy1 + 1, 0)
                inter = iw * ih
                a = (d[:, 2] - d[:, 0] + 1) * (d[:, 3] - d[:, 1] + 1)
                ai = (d[i, 2] - d[i, 0] + 1) * (d[i, 3] - d[i, 1] + 1)
                iou = inter / (a + ai - inter)
                suppressed |= iou > thresh
            return np.asarray(keep, np.int32)

        def rasterize_polygons(polys, h, w):  # noqa: F811
            import cv2
            m = np.zeros((h, w), np.uint8)
            for poly in polys:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                cv2.fillPoly(m, [np.round(pts).astype(np.int32)], 1)
            return m

        NATIVE = False


_load()
