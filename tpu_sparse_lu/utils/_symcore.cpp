// _symcore — native symbolic-analysis core.
//
// The reference's only native components are external (UMFPACK/BLAS —
// SURVEY.md §2 C8/C9). In this framework the host-side symbolic prepass is
// first-party, and at production scale the two hot steps are pure-Python
// bottlenecks (measured at n=250k / K≈2000: 22s closure, plus the level
// recurrence): this module implements them in C++ against the NumPy C API
// (no pybind11 in the image). Python fallbacks remain in symbolic.py /
// refactor.py; the extension is picked up automatically when built.
//
//   level_schedule(brow, bcol, K, lower) -> int64[K]
//       Longest-path level of each chunk in the tile DAG. `brow` must be
//       sorted ascending (tiles keyed brow*K+bcol, as symbolic.py emits).
//
//   blocked_fill(brow, bcol, K) -> (int64[M], int64[M])
//       Closure of a tile pattern under blocked elimination:
//       (i,k),(k,j) present with i,j>k  =>  (i,j) present; all diagonal
//       tiles included. Returns sorted-unique tile coordinates.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <unordered_set>
#include <vector>

namespace {

bool as_int64_vec(PyObject* obj, std::vector<int64_t>& out) {
  PyArrayObject* arr = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  if (!arr) return false;
  npy_intp n = PyArray_SIZE(arr);
  const int64_t* data = (const int64_t*)PyArray_DATA(arr);
  out.assign(data, data + n);
  Py_DECREF(arr);
  return true;
}

PyObject* vec_to_array(const std::vector<int64_t>& v) {
  npy_intp dims[1] = {(npy_intp)v.size()};
  PyObject* arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!arr) return nullptr;
  std::copy(v.begin(), v.end(), (int64_t*)PyArray_DATA((PyArrayObject*)arr));
  return arr;
}

PyObject* level_schedule(PyObject*, PyObject* args) {
  PyObject *ub_o, *uc_o;
  long long K;
  int lower;
  if (!PyArg_ParseTuple(args, "OOLp", &ub_o, &uc_o, &K, &lower))
    return nullptr;
  std::vector<int64_t> ub, uc;
  if (!as_int64_vec(ub_o, ub) || !as_int64_vec(uc_o, uc)) return nullptr;
  if (ub.size() != uc.size()) {
    PyErr_SetString(PyExc_ValueError, "brow/bcol size mismatch");
    return nullptr;
  }
  std::vector<int64_t> level((size_t)K, 0);
  // per-chunk dependency runs: ub sorted ascending
  std::vector<size_t> start((size_t)K + 1, 0);
  {
    size_t p = 0;
    for (int64_t k = 0; k <= K; ++k) {
      while (p < ub.size() && ub[p] < k) ++p;
      start[(size_t)k] = p;
    }
  }
  auto relax = [&](int64_t k) {
    int64_t lk = 0;
    for (size_t p = start[(size_t)k]; p < start[(size_t)k + 1]; ++p) {
      int64_t d = level[(size_t)uc[p]] + 1;
      if (d > lk) lk = d;
    }
    level[(size_t)k] = lk;
  };
  if (lower) {
    for (int64_t k = 0; k < K; ++k) relax(k);
  } else {
    for (int64_t k = K - 1; k >= 0; --k) relax(k);
  }
  return vec_to_array(level);
}

PyObject* blocked_fill(PyObject*, PyObject* args) {
  PyObject *br_o, *bc_o;
  long long K;
  if (!PyArg_ParseTuple(args, "OOL", &br_o, &bc_o, &K)) return nullptr;
  std::vector<int64_t> br, bc;
  if (!as_int64_vec(br_o, br) || !as_int64_vec(bc_o, bc)) return nullptr;
  if (br.size() != bc.size()) {
    PyErr_SetString(PyExc_ValueError, "brow/bcol size mismatch");
    return nullptr;
  }
  std::unordered_set<int64_t> seen;
  seen.reserve(br.size() * 2 + (size_t)K);
  std::vector<std::vector<int64_t>> col_of((size_t)K);  // rows i>j per col j
  std::vector<std::vector<int64_t>> row_of((size_t)K);  // cols j>i per row i
  auto insert = [&](int64_t i, int64_t j) {
    int64_t key = i * K + j;
    if (!seen.insert(key).second) return;
    if (i > j)
      col_of[(size_t)j].push_back(i);
    else if (i < j)
      row_of[(size_t)i].push_back(j);
  };
  for (int64_t k = 0; k < K; ++k) insert(k, k);
  for (size_t t = 0; t < br.size(); ++t) insert(br[t], bc[t]);

  for (int64_t k = 0; k < K; ++k) {
    // copy: insert() may grow these vectors for future k only, but the
    // current k's lists must be snapshotted against reallocation
    std::vector<int64_t> rows = col_of[(size_t)k];
    std::vector<int64_t> cols = row_of[(size_t)k];
    for (int64_t i : rows)
      for (int64_t j : cols) insert(i, j);
  }

  std::vector<int64_t> keys(seen.begin(), seen.end());
  std::sort(keys.begin(), keys.end());
  std::vector<int64_t> out_r(keys.size()), out_c(keys.size());
  for (size_t t = 0; t < keys.size(); ++t) {
    out_r[t] = keys[t] / K;
    out_c[t] = keys[t] % K;
  }
  PyObject* r = vec_to_array(out_r);
  PyObject* c = vec_to_array(out_c);
  if (!r || !c) {
    Py_XDECREF(r);
    Py_XDECREF(c);
    return nullptr;
  }
  return PyTuple_Pack(2, r, c);
}

PyMethodDef methods[] = {
    {"level_schedule", level_schedule, METH_VARARGS,
     "level_schedule(brow, bcol, K, lower) -> int64[K]"},
    {"blocked_fill", blocked_fill, METH_VARARGS,
     "blocked_fill(brow, bcol, K) -> (brow, bcol) closure"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moddef = {
    PyModuleDef_HEAD_INIT, "_symcore",
    "Native symbolic-analysis core for tpu-sparse-lu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__symcore(void) {
  import_array();
  return PyModule_Create(&moddef);
}
