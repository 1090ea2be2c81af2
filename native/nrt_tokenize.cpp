// Native tokenization for the indexing hot loop.
//
// The reference's per-document hot loop is Lucene's token/posting build inside
// IndexWriter.addDocuments (SURVEY.md §3.2). Our Python analyzer chain spends
// most of its time in regex matching and per-token object churn; this CPython
// extension implements the default "standard" analyzer path (word tokens,
// lowercased) directly over the UTF-8 bytes and returns {term: [positions]}
// ready for postings accumulation.
//
// ASCII fast path only: any non-ASCII byte returns None and the caller falls
// back to the Python analyzer (full Unicode segmentation parity preserved).
//
// Build: g++ -O3 -shared -fPIC $(python3-config --includes) \
//        native/nrt_tokenize.cpp -o <pkg>/nrt_native.<abi>.so
// (done automatically by nrtsearch_tpu/native_ext.py on first import)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <string>
#include <unordered_map>
#include <vector>

namespace {

// token chars mirror the Python _STANDARD_RE = [^\W_]+ : alphanumerics,
// excluding underscore
inline bool is_token_char(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9');
}

inline char lower(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                : static_cast<char>(c);
}

// std_term_positions(text: str, position_base: int = 0)
//   -> dict[str, list[int]] | None
PyObject* std_term_positions(PyObject*, PyObject* args) {
  const char* data;
  Py_ssize_t len;
  Py_ssize_t base = 0;
  if (!PyArg_ParseTuple(args, "s#|n", &data, &len, &base)) return nullptr;

  // non-ASCII -> let Python handle full Unicode segmentation
  for (Py_ssize_t i = 0; i < len; i++) {
    if (static_cast<unsigned char>(data[i]) >= 0x80) Py_RETURN_NONE;
  }

  std::unordered_map<std::string, std::vector<long>> terms;
  terms.reserve(64);
  std::string buf;
  long pos = static_cast<long>(base);
  Py_ssize_t i = 0;
  long emitted = 0;
  while (i < len) {
    while (i < len && !is_token_char(static_cast<unsigned char>(data[i]))) i++;
    if (i >= len) break;
    buf.clear();
    while (i < len && is_token_char(static_cast<unsigned char>(data[i]))) {
      buf.push_back(lower(static_cast<unsigned char>(data[i])));
      i++;
    }
    terms[buf].push_back(pos);
    pos++;
    emitted++;
  }

  PyObject* dict = PyDict_New();
  if (!dict) return nullptr;
  for (auto& kv : terms) {
    PyObject* list = PyList_New(static_cast<Py_ssize_t>(kv.second.size()));
    if (!list) {
      Py_DECREF(dict);
      return nullptr;
    }
    for (size_t j = 0; j < kv.second.size(); j++) {
      PyList_SET_ITEM(list, static_cast<Py_ssize_t>(j),
                      PyLong_FromLong(kv.second[j]));
    }
    PyObject* key = PyUnicode_FromStringAndSize(
        kv.first.data(), static_cast<Py_ssize_t>(kv.first.size()));
    if (!key || PyDict_SetItem(dict, key, list) < 0) {
      Py_XDECREF(key);
      Py_DECREF(list);
      Py_DECREF(dict);
      return nullptr;
    }
    Py_DECREF(key);
    Py_DECREF(list);
  }
  // (terms dict, token count) — the count is the field length for norms
  PyObject* count = PyLong_FromLong(emitted);
  PyObject* result = PyTuple_Pack(2, dict, count);
  Py_DECREF(dict);
  Py_DECREF(count);
  return result;
}

PyMethodDef methods[] = {
    {"std_term_positions", std_term_positions, METH_VARARGS,
     "standard-analyzer term->positions map for ASCII text, else None"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "nrt_native",
    "native tokenization for nrtsearch_tpu", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_nrt_native(void) { return PyModule_Create(&moduledef); }
