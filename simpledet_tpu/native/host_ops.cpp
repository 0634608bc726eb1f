// Native host kernels — the C++ replacement for the reference's Cython/CUDA
// host layer (operator_py/cython/{cpu_nms.pyx,bbox.pyx} and the COCO
// maskApi polygon rasterizer linked by proposal_mask_target.cc).
//
// Exposed via the CPython C API (no pybind11 in this image):
//   cpu_nms(dets float32[N,5], thresh) -> int32[K] keep indices
//   cpu_soft_nms(dets float32[N,5], sigma, Nt, thresh, method) -> float32[M,5]
//   bbox_overlaps(boxes float32[N,4], query float32[K,4]) -> float32[N,K]
//   rasterize_polygons(polys list[float32[2P]], h, w) -> uint8[h,w]
//
// The device path never calls these; they accelerate the host-side eval
// pipeline (per-class NMS fallback, gt mask rasterization for segm eval)
// and data tooling.
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <vector>

namespace {

inline float iou_pp1(const float* a, const float* b) {
  // legacy +1 convention (cython bbox.pyx)
  float iw = std::min(a[2], b[2]) - std::max(a[0], b[0]) + 1.0f;
  if (iw <= 0) return 0.f;
  float ih = std::min(a[3], b[3]) - std::max(a[1], b[1]) + 1.0f;
  if (ih <= 0) return 0.f;
  float inter = iw * ih;
  float area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1);
  float area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1);
  return inter / (area_a + area_b - inter);
}

PyObject* cpu_nms(PyObject*, PyObject* args) {
  PyArrayObject* dets_obj;
  double thresh;
  if (!PyArg_ParseTuple(args, "O!d", &PyArray_Type, &dets_obj, &thresh))
    return nullptr;
  PyArrayObject* dets = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)dets_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  if (!dets) return nullptr;
  const npy_intp n = PyArray_DIM(dets, 0);
  const float* d = (const float*)PyArray_DATA(dets);

  std::vector<int> order(n);
  for (npy_intp i = 0; i < n; ++i) order[i] = (int)i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return d[a * 5 + 4] > d[b * 5 + 4]; });

  std::vector<char> suppressed(n, 0);
  std::vector<int> keep;
  keep.reserve(n);
  for (npy_intp oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep.push_back(i);
    for (npy_intp oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      if (iou_pp1(d + i * 5, d + j * 5) > thresh) suppressed[j] = 1;
    }
  }
  Py_DECREF(dets);
  npy_intp k = (npy_intp)keep.size();
  PyObject* out = PyArray_SimpleNew(1, &k, NPY_INT32);
  std::copy(keep.begin(), keep.end(), (int*)PyArray_DATA((PyArrayObject*)out));
  return out;
}

PyObject* cpu_soft_nms(PyObject*, PyObject* args) {
  PyArrayObject* dets_obj;
  double sigma = 0.5, Nt = 0.3, thresh = 0.001;
  int method = 1;  // 0 linear, 1 gaussian, else hard
  if (!PyArg_ParseTuple(args, "O!|dddi", &PyArray_Type, &dets_obj, &sigma,
                        &Nt, &thresh, &method))
    return nullptr;
  PyArrayObject* dets_in = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)dets_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  if (!dets_in) return nullptr;
  npy_intp n = PyArray_DIM(dets_in, 0);
  std::vector<float> d((float*)PyArray_DATA(dets_in),
                       (float*)PyArray_DATA(dets_in) + n * 5);
  Py_DECREF(dets_in);

  // classic soft-nms in-place algorithm (cython cpu_soft_nms port)
  npy_intp N = n;
  for (npy_intp i = 0; i < N; ++i) {
    // argmax over remaining
    npy_intp max_pos = i;
    for (npy_intp j = i + 1; j < N; ++j)
      if (d[j * 5 + 4] > d[max_pos * 5 + 4]) max_pos = j;
    for (int c = 0; c < 5; ++c) std::swap(d[i * 5 + c], d[max_pos * 5 + c]);

    npy_intp pos = i + 1;
    while (pos < N) {
      float ov = iou_pp1(&d[i * 5], &d[pos * 5]);
      float weight = 1.0f;
      if (method == 0) {                      // linear
        if (ov > Nt) weight = 1.0f - ov;
      } else if (method == 1) {               // gaussian
        weight = std::exp(-(ov * ov) / (float)sigma);
      } else {                                // hard nms
        if (ov > Nt) weight = 0.0f;
      }
      d[pos * 5 + 4] *= weight;
      // cython cpu_soft_nms only runs the drop check inside the
      // iw>0 && ih>0 branch: untouched boxes are never dropped
      if (ov > 0 && d[pos * 5 + 4] < thresh) {
        for (int c = 0; c < 5; ++c) std::swap(d[pos * 5 + c], d[(N - 1) * 5 + c]);
        --N;
      } else {
        ++pos;
      }
    }
  }
  npy_intp dims[2] = {N, 5};
  PyObject* out = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  std::copy(d.begin(), d.begin() + N * 5,
            (float*)PyArray_DATA((PyArrayObject*)out));
  return out;
}

PyObject* bbox_overlaps(PyObject*, PyObject* args) {
  PyArrayObject *b_obj, *q_obj;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &b_obj, &PyArray_Type,
                        &q_obj))
    return nullptr;
  PyArrayObject* b = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)b_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  PyArrayObject* q = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)q_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  if (!b || !q) return nullptr;
  npy_intp n = PyArray_DIM(b, 0), k = PyArray_DIM(q, 0);
  npy_intp bs = PyArray_DIM(b, 1), qs = PyArray_DIM(q, 1);
  const float* bp = (const float*)PyArray_DATA(b);
  const float* qp = (const float*)PyArray_DATA(q);
  npy_intp dims[2] = {n, k};
  PyObject* out = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  float* op = (float*)PyArray_DATA((PyArrayObject*)out);
  for (npy_intp j = 0; j < k; ++j) {
    const float* qb = qp + j * qs;
    float qarea = (qb[2] - qb[0] + 1) * (qb[3] - qb[1] + 1);
    for (npy_intp i = 0; i < n; ++i) {
      const float* bb = bp + i * bs;
      float iw = std::min(bb[2], qb[2]) - std::max(bb[0], qb[0]) + 1;
      float v = 0.f;
      if (iw > 0) {
        float ih = std::min(bb[3], qb[3]) - std::max(bb[1], qb[1]) + 1;
        if (ih > 0) {
          float ua =
              (bb[2] - bb[0] + 1) * (bb[3] - bb[1] + 1) + qarea - iw * ih;
          v = iw * ih / ua;
        }
      }
      op[i * k + j] = v;
    }
  }
  Py_DECREF(b);
  Py_DECREF(q);
  return out;
}

// even-odd scanline polygon fill at pixel centers; multiple rings unioned
PyObject* rasterize_polygons(PyObject*, PyObject* args) {
  PyObject* polys;
  int h, w;
  if (!PyArg_ParseTuple(args, "Oii", &polys, &h, &w)) return nullptr;
  npy_intp dims[2] = {h, w};
  PyObject* out = PyArray_ZEROS(2, dims, NPY_UINT8, 0);
  unsigned char* m = (unsigned char*)PyArray_DATA((PyArrayObject*)out);

  PyObject* seq = PySequence_Fast(polys, "polys must be a sequence");
  if (!seq) {
    Py_DECREF(out);
    return nullptr;
  }
  Py_ssize_t n_poly = PySequence_Fast_GET_SIZE(seq);
  for (Py_ssize_t p = 0; p < n_poly; ++p) {
    PyArrayObject* arr = (PyArrayObject*)PyArray_FROM_OTF(
        PySequence_Fast_GET_ITEM(seq, p), NPY_FLOAT64,
        NPY_ARRAY_C_CONTIGUOUS);
    if (!arr) {
      Py_DECREF(seq);
      Py_DECREF(out);
      return nullptr;
    }
    npy_intp len = PyArray_SIZE(arr);
    const double* xy = (const double*)PyArray_DATA(arr);
    npy_intp nv = len / 2;
    if (nv >= 3) {
      std::vector<double> xs;
      for (int row = 0; row < h; ++row) {
        double py = row + 0.5;
        xs.clear();
        for (npy_intp v = 0; v < nv; ++v) {
          double x0 = xy[2 * v], y0 = xy[2 * v + 1];
          double x1 = xy[2 * ((v + 1) % nv)], y1 = xy[2 * ((v + 1) % nv) + 1];
          if ((y0 <= py) != (y1 <= py)) {
            xs.push_back(x0 + (py - y0) / (y1 - y0) * (x1 - x0));
          }
        }
        std::sort(xs.begin(), xs.end());
        for (size_t s = 0; s + 1 < xs.size(); s += 2) {
          int c0 = (int)std::ceil(xs[s] - 0.5);
          int c1 = (int)std::floor(xs[s + 1] - 0.5);
          c0 = std::max(c0, 0);
          c1 = std::min(c1, w - 1);
          for (int c = c0; c <= c1; ++c) m[row * w + c] = 1;
        }
      }
    }
    Py_DECREF(arr);
  }
  Py_DECREF(seq);
  return out;
}

PyMethodDef methods[] = {
    {"cpu_nms", cpu_nms, METH_VARARGS, "greedy NMS, returns keep indices"},
    {"cpu_soft_nms", cpu_soft_nms, METH_VARARGS, "soft NMS"},
    {"bbox_overlaps", bbox_overlaps, METH_VARARGS, "IoU matrix (+1 conv)"},
    {"rasterize_polygons", rasterize_polygons, METH_VARARGS,
     "even-odd scanline fill"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "host_ops",
                      "native host detection kernels", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_host_ops(void) {
  import_array();
  return PyModule_Create(&module);
}
