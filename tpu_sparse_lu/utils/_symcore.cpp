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
//
//   plan_maps(indptr, indices, cs, K, lower, extra_keys)
//       -> (uniq_keys int64[T], diag_dest int64[nnz], offdiag_dest
//          int64[nnz])
//       The O(nnz) middle of plan_triangular in one pass: the sorted
//       unique off-diagonal tile keys (brow*K + bcol, merged with
//       `extra_keys`) plus the per-nonzero pack scatter destinations
//       (exactly one of diag/offdiag is real; the other holds the
//       one-past-the-end drop sentinel). The NumPy version materializes
//       half a dozen nnz-length temporaries (~21 s at nnz = 58M);
//       this pass runs in ~1 s.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// Zero-copy view over an int32/int64 NumPy array (other dtypes are
// converted). plan_maps reads ~0.5 GB of index arrays per call; copying
// them into vectors costs more in page faults than the actual passes.
struct IntView {
  PyArrayObject* arr = nullptr;
  const int64_t* d64 = nullptr;
  const int32_t* d32 = nullptr;
  size_t n = 0;
  ~IntView() { Py_XDECREF(arr); }
  bool init(PyObject* obj) {
    PyArrayObject* probe = (PyArrayObject*)PyArray_FROM_O(obj);
    if (!probe) return false;
    const int t = PyArray_TYPE(probe);
    Py_DECREF(probe);
    const int want = (t == NPY_INT32) ? NPY_INT32 : NPY_INT64;
    arr = (PyArrayObject*)PyArray_FROM_OTF(obj, want, NPY_ARRAY_IN_ARRAY);
    if (!arr) return false;
    n = (size_t)PyArray_SIZE(arr);
    if (want == NPY_INT32)
      d32 = (const int32_t*)PyArray_DATA(arr);
    else
      d64 = (const int64_t*)PyArray_DATA(arr);
    return true;
  }
  inline int64_t operator[](size_t i) const {
    return d64 ? d64[i] : (int64_t)d32[i];
  }
};

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

PyObject* plan_maps(PyObject*, PyObject* args) {
  PyObject *indptr_o, *indices_o, *extra_o;
  long long cs_l, K_l;
  int lower;
  if (!PyArg_ParseTuple(args, "OOLLpO", &indptr_o, &indices_o, &cs_l, &K_l,
                        &lower, &extra_o))
    return nullptr;
  const int64_t cs = cs_l, K = K_l;
  IntView indptr, rows;
  std::vector<int64_t> extra;
  if (!indptr.init(indptr_o) || !rows.init(indices_o) ||
      !as_int64_vec(extra_o, extra))
    return nullptr;
  if (indptr.n == 0) {
    PyErr_SetString(PyExc_ValueError, "empty indptr");
    return nullptr;
  }
  const int64_t n = (int64_t)indptr.n - 1;
  const int64_t nnz = (int64_t)rows.n;
  // runtime 64-bit idiv costs ~20-40 cycles and runs 3-4x per nonzero —
  // use shift/mask for the (usual) power-of-two chunk sizes
  const bool pow2 = cs > 0 && (cs & (cs - 1)) == 0;
  const int shift = pow2 ? __builtin_ctzll((unsigned long long)cs) : 0;
  const int64_t mask = cs - 1;
  auto divcs = [&](int64_t v) { return pow2 ? (v >> shift) : (v / cs); };
  auto modcs = [&](int64_t v) { return pow2 ? (v & mask) : (v % cs); };

  // pass 1: unique off-diagonal tile keys (+ wrong-side validation).
  // CSC row indices are sorted within a column, so consecutive nonzeros
  // usually share a tile — a last-key cache skips most hash inserts
  // (measured 2x on 58M-nnz factors).
  std::unordered_set<int64_t> tiles;
  tiles.reserve(4096);
  for (int64_t k : extra) tiles.insert(k);
  int64_t bad = 0;
  for (int64_t j = 0; j < n; ++j) {
    const int64_t bcol = divcs(j);
    int64_t last_key = -1;
    for (int64_t p = indptr[(size_t)j]; p < indptr[(size_t)j + 1]; ++p) {
      const int64_t brow = divcs(rows[(size_t)p]);
      if (brow == bcol) continue;
      if (lower ? (brow > bcol) : (brow < bcol)) {
        const int64_t key = brow * K + bcol;
        if (key != last_key) {
          tiles.insert(key);
          last_key = key;
        }
      } else {
        ++bad;
      }
    }
  }
  if (bad) {
    PyErr_Format(PyExc_ValueError,
                 "%lld entries on the wrong side of the diagonal for %s "
                 "factor",
                 (long long)bad, lower ? "lower" : "upper");
    return nullptr;
  }
  std::vector<int64_t> uniq(tiles.begin(), tiles.end());
  std::sort(uniq.begin(), uniq.end());
  const int64_t T = (int64_t)uniq.size();
  std::unordered_map<int64_t, int64_t> tid;
  tid.reserve(uniq.size() * 2);
  for (int64_t t = 0; t < T; ++t) tid.emplace(uniq[(size_t)t], t);

  // pass 2: pack scatter destinations (drop sentinel = one-past-the-end)
  const int64_t diag_sent = (K + 1) * cs * cs;
  const int64_t off_sent = (T + 1) * cs * cs;
  npy_intp dims[1] = {(npy_intp)nnz};
  PyObject* diag_arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  PyObject* off_arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!diag_arr || !off_arr) {
    Py_XDECREF(diag_arr);
    Py_XDECREF(off_arr);
    return nullptr;
  }
  int64_t* dd = (int64_t*)PyArray_DATA((PyArrayObject*)diag_arr);
  int64_t* od = (int64_t*)PyArray_DATA((PyArrayObject*)off_arr);
  for (int64_t j = 0; j < n; ++j) {
    const int64_t bcol = divcs(j);
    const int64_t lc = modcs(j);
    int64_t last_key = -1, last_tid = 0;
    for (int64_t p = indptr[(size_t)j]; p < indptr[(size_t)j + 1]; ++p) {
      const int64_t r = rows[(size_t)p];
      const int64_t brow = divcs(r);
      const int64_t lr = modcs(r);
      if (brow == bcol) {
        dd[p] = (brow * cs + lr) * cs + lc;
        od[p] = off_sent;
      } else {
        const int64_t key = brow * K + bcol;
        if (key != last_key) {
          last_tid = tid[key];
          last_key = key;
        }
        dd[p] = diag_sent;
        od[p] = (last_tid * cs + lr) * cs + lc;
      }
    }
  }
  PyObject* uk = vec_to_array(uniq);
  if (!uk) {
    Py_DECREF(diag_arr);
    Py_DECREF(off_arr);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(3, uk, diag_arr, off_arr);
  Py_DECREF(uk);
  Py_DECREF(diag_arr);
  Py_DECREF(off_arr);
  return out;
}

PyMethodDef methods[] = {
    {"level_schedule", level_schedule, METH_VARARGS,
     "level_schedule(brow, bcol, K, lower) -> int64[K]"},
    {"blocked_fill", blocked_fill, METH_VARARGS,
     "blocked_fill(brow, bcol, K) -> (brow, bcol) closure"},
    {"plan_maps", plan_maps, METH_VARARGS,
     "plan_maps(indptr, indices, cs, K, lower, extra_keys) -> "
     "(uniq_keys, diag_dest, offdiag_dest)"},
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
