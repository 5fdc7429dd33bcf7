// C-callable VisualOdometry entry: the foreign-binding analogue of the
// reference's MATLAB mex interface (/root/reference/matlab/vo_mex.cc +
// VoMex.m:1-52 — a handle-based new / add_frame / delete API embedded in a
// host runtime).  Here the host runtime is any C/C++ application: the
// library embeds CPython (exactly as mex embeds the reference library in
// MATLAB's process), drives the public `bpvo_tpu.VisualOdometry` API, and
// marshals frames in and poses out through plain C buffers.
//
//   bpvo_vo_t* h = bpvo_vo_create(K9, baseline, rows, cols, config_or_null);
//   bpvo_vo_add_frame(h, image_f32, disparity_f32, pose16, &is_keyframe);
//   bpvo_vo_destroy(h);
//
// When loaded INTO an existing Python process (ctypes), Py_IsInitialized()
// short-circuits the embedding and the calls ride the caller's interpreter —
// which is how tests/test_native.py exercises this file.  All entry points
// take the GIL via PyGILState_Ensure, so the handle may be driven from any
// host thread.
//
// Build: make -C native capi   (links libpython; see Makefile)

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>

namespace {

std::string g_error;  // guarded by the GIL at every assignment site

void set_error_from_python() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  g_error = "python error";
  if (value) {
    if (PyObject* s = PyObject_Str(value)) {
      if (const char* c = PyUnicode_AsUTF8(s)) g_error = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

// numpy f32 array VIEW over caller memory: np.frombuffer(mv, f32).reshape(..)
PyObject* f32_view(PyObject* np, const float* data, int rows, int cols) {
  PyObject* mv = PyMemoryView_FromMemory(
      reinterpret_cast<char*>(const_cast<float*>(data)),
      static_cast<Py_ssize_t>(rows) * cols * sizeof(float), PyBUF_READ);
  if (!mv) return nullptr;
  PyObject* flat = PyObject_CallMethod(np, "frombuffer", "Os", mv, "float32");
  Py_DECREF(mv);
  if (!flat) return nullptr;
  PyObject* arr = PyObject_CallMethod(flat, "reshape", "(ii)", rows, cols);
  Py_DECREF(flat);
  return arr;
}

struct Vo {
  PyObject* vo = nullptr;   // bpvo_tpu.VisualOdometry instance
  PyObject* np = nullptr;   // numpy module
  int rows = 0, cols = 0;
};

}  // namespace

extern "C" {

typedef struct Vo bpvo_vo_t;

const char* bpvo_vo_last_error(void) { return g_error.c_str(); }

// K9: row-major 3x3 intrinsics.  config_path may be NULL (defaults) or a
// reference-format `Key = Value` file (conf/*.cfg parse unchanged).
bpvo_vo_t* bpvo_vo_create(const float* K9, float baseline, int rows, int cols,
                          const char* config_path) {
  static std::once_flag init_once;
  std::call_once(init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // embedding owns the interpreter: release the GIL so every entry
      // point (including this thread's) acquires it via PyGILState_Ensure
      PyEval_SaveThread();
    }
  });

  PyGILState_STATE gil = PyGILState_Ensure();
  Vo* h = new Vo();
  h->rows = rows;
  h->cols = cols;
  do {
    h->np = PyImport_ImportModule("numpy");
    if (!h->np) break;
    PyObject* mod = PyImport_ImportModule("bpvo_tpu");
    if (!mod) break;

    PyObject* params = nullptr;
    if (config_path && config_path[0]) {
      PyObject* cfg_mod = PyImport_ImportModule("bpvo_tpu.config");
      if (!cfg_mod) { Py_DECREF(mod); break; }
      PyObject* cf = PyObject_CallMethod(cfg_mod, "ConfigFile", "s",
                                         config_path);
      if (cf) {
        PyObject* ap = PyObject_GetAttrString(cfg_mod, "AlgorithmParameters");
        if (ap) {
          params = PyObject_CallMethod(ap, "from_config", "O", cf);
          Py_DECREF(ap);
        }
        Py_DECREF(cf);
      }
      Py_DECREF(cfg_mod);
      if (!params) { Py_DECREF(mod); break; }
    } else {
      params = Py_None;
      Py_INCREF(Py_None);
    }

    PyObject* K = f32_view(h->np, K9, 3, 3);
    if (!K) { Py_DECREF(params); Py_DECREF(mod); break; }
    PyObject* size = Py_BuildValue("(ii)", rows, cols);
    PyObject* bl = PyFloat_FromDouble(baseline);
    PyObject* cls = PyObject_GetAttrString(mod, "VisualOdometry");
    if (cls && size && bl) {
      h->vo = PyObject_CallFunctionObjArgs(cls, K, bl, size, params, nullptr);
    }
    Py_XDECREF(cls);
    Py_XDECREF(bl);
    Py_XDECREF(size);
    Py_DECREF(K);
    Py_DECREF(params);
    Py_DECREF(mod);
  } while (false);

  if (!h->vo) {
    set_error_from_python();
    Py_XDECREF(h->np);
    delete h;
    PyGILState_Release(gil);
    return nullptr;
  }
  PyGILState_Release(gil);
  return h;
}

// image/disparity: row-major float32 [rows*cols] (grayscale intensity /
// stereo disparity in pixels).  pose_out: row-major 4x4 relative motion wrt
// the previous frame (reference Result::pose).  is_keyframe may be NULL.
// Returns 0 on success, -1 on error (see bpvo_vo_last_error).
int bpvo_vo_add_frame(bpvo_vo_t* h, const float* image,
                      const float* disparity, float* pose_out,
                      int* is_keyframe) {
  if (!h || !h->vo) { g_error = "null handle"; return -1; }
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = -1;
  do {
    PyObject* img = f32_view(h->np, image, h->rows, h->cols);
    if (!img) break;
    PyObject* dsp = f32_view(h->np, disparity, h->rows, h->cols);
    if (!dsp) { Py_DECREF(img); break; }
    PyObject* res = PyObject_CallMethod(h->vo, "add_frame", "OO", img, dsp);
    Py_DECREF(dsp);
    Py_DECREF(img);
    if (!res) break;

    PyObject* pose = PyObject_GetAttrString(res, "pose");
    if (pose && pose_out) {
      PyObject* p32 = PyObject_CallMethod(h->np, "ascontiguousarray", "Os",
                                          pose, "float32");
      if (p32) {
        PyObject* bytes = PyObject_CallMethod(p32, "tobytes", nullptr);
        if (bytes && PyBytes_GET_SIZE(bytes) == 16 * (Py_ssize_t)sizeof(float)) {
          std::memcpy(pose_out, PyBytes_AS_STRING(bytes), 16 * sizeof(float));
          rc = 0;
        }
        Py_XDECREF(bytes);
        Py_DECREF(p32);
      }
    } else if (!pose_out) {
      rc = 0;
    }
    Py_XDECREF(pose);
    if (is_keyframe) {
      PyObject* kf = PyObject_GetAttrString(res, "is_keyframe");
      *is_keyframe = kf ? (PyObject_IsTrue(kf) == 1) : 0;
      Py_XDECREF(kf);
    }
    Py_DECREF(res);
  } while (false);
  if (rc != 0) set_error_from_python();
  PyGILState_Release(gil);
  return rc;
}

// Number of frames in the trajectory so far (reference Trajectory::size).
int bpvo_vo_trajectory_size(bpvo_vo_t* h) {
  if (!h || !h->vo) return -1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int n = -1;
  PyObject* traj = PyObject_GetAttrString(h->vo, "trajectory");
  if (traj) {
    Py_ssize_t len = PyObject_Length(traj);
    if (len >= 0) n = static_cast<int>(len);
    Py_DECREF(traj);
  }
  if (n < 0) set_error_from_python();
  PyGILState_Release(gil);
  return n;
}

void bpvo_vo_destroy(bpvo_vo_t* h) {
  if (!h) return;
  PyGILState_STATE gil = PyGILState_Ensure();
  Py_XDECREF(h->vo);
  Py_XDECREF(h->np);
  PyGILState_Release(gil);
  delete h;
}

}  // extern "C"
