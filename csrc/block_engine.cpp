// Native paged KV-cache block engine.
//
// C++ implementation of the host-side paged-block bookkeeping that the
// Python BlockSpaceManager (vllm_splitwise_tpu/core/block_manager.py)
// exposes: ref-counted physical blocks, copy-on-write, prefix-cache
// hashing with an LRU evictor, device<->host swap planning, and
// computed-block tracking.  Role-parity with the reference engine's
// vllm/core/block_manager.py:13-487, moved to native code for the
// serving control plane's hot path (called on every scheduler step for
// every running sequence).
//
// The interface is integer-only (seq ids, block numbers, hashes) so the
// Python adapter (core/native_block_manager.py) stays a thin shim: all
// mutable bookkeeping state lives on this side.  Semantics mirror the
// Python manager exactly; the equivalence suite
// (tests/core/test_native_block_engine.py) drives both through random
// workloads and asserts identical observable behavior.
//
// Built with the CPython C API (no pybind11 in the image); compiled
// on demand by core/_native_build.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <deque>
#include <limits>
#include <memory>
#include <stdexcept>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int kDeviceTpu = 0;
constexpr int kDeviceCpu = 1;
// Matches Python's `block_hash=None` (allocate a throwaway unique hash).
constexpr int64_t kNoHash = std::numeric_limits<int64_t>::min();

struct Block {
  int device = kDeviceTpu;
  int32_t number = 0;
  int64_t hash = -1;
  int64_t num_hashed_tokens = 0;
  int32_t ref_count = 0;
  double last_accessed = -1.0;
  bool computed = false;
  uint64_t enter_seq = 0;  // evictor insertion order (tie-break)
};

// LRU evictor over zero-ref cached blocks: evict the smallest
// last_accessed; ties prefer the largest num_hashed_tokens.  Linear
// scan like the Python LRUEvictor (eviction is rare relative to
// alloc/free traffic).
struct Evictor {
  std::unordered_map<int64_t, Block*> free_table;
  uint64_t next_enter_seq = 0;

  bool contains(int64_t h) const { return free_table.count(h) != 0; }

  // Victim order matches the Python LRUEvictor scan over its
  // insertion-ordered dict: smallest last_accessed, then largest
  // num_hashed_tokens, then EARLIEST insertion (full ties keep the
  // first-inserted block).
  Block* evict() {
    if (free_table.empty())
      throw std::runtime_error("No usable cache memory left");
    Block* victim = nullptr;
    for (auto& [h, b] : free_table) {
      if (!victim) { victim = b; continue; }
      if (b->last_accessed != victim->last_accessed) {
        if (b->last_accessed < victim->last_accessed) victim = b;
      } else if (b->num_hashed_tokens != victim->num_hashed_tokens) {
        if (b->num_hashed_tokens > victim->num_hashed_tokens) victim = b;
      } else if (b->enter_seq < victim->enter_seq) {
        victim = b;
      }
    }
    free_table.erase(victim->hash);
    victim->computed = false;
    return victim;
  }

  void add(Block* b) {
    b->enter_seq = next_enter_seq++;
    free_table[b->hash] = b;
  }

  Block* remove(int64_t h) {
    auto it = free_table.find(h);
    if (it == free_table.end())
      throw std::runtime_error("block not in evictor");
    Block* b = it->second;
    free_table.erase(it);
    return b;
  }

  size_t num_blocks() const { return free_table.size(); }
};

struct Allocator {
  int device;
  int64_t block_size;
  int64_t num_blocks;
  bool caching;

  std::deque<Block> arena;  // stable addresses
  std::vector<Block*> free_list;
  std::unordered_map<int64_t, Block*> cached_blocks;
  Evictor evictor;
  int64_t current_num_blocks = 0;
  int64_t default_hash_ctr = 0;

  Allocator(int device, int64_t block_size, int64_t num_blocks,
            bool caching)
      : device(device), block_size(block_size), num_blocks(num_blocks),
        caching(caching) {
    if (!caching) {
      arena.resize(num_blocks);
      // Python pops from the back of the free list; pre-populated
      // 0..n-1, so first allocation hands out block n-1.  Replicate.
      free_list.reserve(num_blocks);
      for (int64_t i = 0; i < num_blocks; ++i) {
        arena[i].device = device;
        arena[i].number = static_cast<int32_t>(i);
        free_list.push_back(&arena[i]);
      }
    }
  }

  Block* allocate_block(int64_t hash, int64_t num_hashed) {
    if (current_num_blocks == num_blocks) {
      Block* b = evictor.evict();
      b->hash = hash;
      b->num_hashed_tokens = num_hashed;
      return b;
    }
    arena.emplace_back();
    Block* b = &arena.back();
    b->device = device;
    b->number = static_cast<int32_t>(current_num_blocks);
    b->hash = hash;
    b->num_hashed_tokens = num_hashed;
    ++current_num_blocks;
    return b;
  }

  Block* allocate(int64_t hash = kNoHash, int64_t num_hashed = 0) {
    if (!caching) {
      if (free_list.empty())
        throw std::runtime_error(
            "Out of memory! No free blocks are available.");
      Block* b = free_list.back();
      free_list.pop_back();
      b->ref_count = 1;
      return b;
    }
    if (hash == kNoHash) hash = default_hash_ctr++;
    if (evictor.contains(hash)) {
      Block* b = evictor.remove(hash);
      cached_blocks[hash] = b;
      b->ref_count += 1;
      return b;
    }
    auto it = cached_blocks.find(hash);
    if (it == cached_blocks.end())
      it = cached_blocks.emplace(hash, allocate_block(hash, num_hashed))
               .first;
    it->second->ref_count += 1;
    return it->second;
  }

  void free_block(Block* b) {
    if (b->ref_count == 0)
      throw std::runtime_error("Double free of a physical block");
    b->ref_count -= 1;
    if (b->ref_count == 0) {
      if (caching) {
        evictor.add(b);
        cached_blocks.erase(b->hash);
      } else {
        free_list.push_back(b);
      }
    }
  }

  int64_t num_free() const {
    if (caching)
      return num_blocks - current_num_blocks +
             static_cast<int64_t>(evictor.num_blocks());
    return static_cast<int64_t>(free_list.size());
  }

  bool contains_block(int64_t hash) const {
    return cached_blocks.count(hash) != 0 || evictor.contains(hash);
  }

  void update_hash(int64_t new_hash, Block* b) {
    int64_t old = b->hash;
    b->hash = new_hash;
    cached_blocks.erase(old);
    cached_blocks[new_hash] = b;
  }
};

struct Engine {
  int64_t block_size;
  int64_t num_total_gpu_blocks;
  int64_t num_total_cpu_blocks;
  int64_t watermark_blocks;
  int64_t sliding_window_blocks;  // -1 = none
  bool caching;

  Allocator gpu;
  Allocator cpu;
  std::unordered_map<int64_t, std::vector<Block*>> tables;

  Engine(int64_t bs, int64_t ngpu, int64_t ncpu, int64_t watermark,
         int64_t window, bool caching)
      : block_size(bs), num_total_gpu_blocks(ngpu),
        num_total_cpu_blocks(ncpu), watermark_blocks(watermark),
        sliding_window_blocks(window), caching(caching),
        gpu(kDeviceTpu, bs, ngpu, caching),
        cpu(kDeviceCpu, bs, ncpu, caching) {}

  std::vector<Block*>& table(int64_t seq_id) {
    auto it = tables.find(seq_id);
    if (it == tables.end())
      throw std::runtime_error("unknown seq id");
    return it->second;
  }
};

// ---------------- Python object plumbing ----------------

struct PyEngine {
  PyObject_HEAD
  Engine* engine;
};

PyObject* engine_new(PyTypeObject* type, PyObject*, PyObject*) {
  PyEngine* self = reinterpret_cast<PyEngine*>(type->tp_alloc(type, 0));
  if (self) self->engine = nullptr;
  return reinterpret_cast<PyObject*>(self);
}

int engine_init(PyObject* raw, PyObject* args, PyObject* kwds) {
  static const char* kwlist[] = {"block_size",       "num_gpu_blocks",
                                 "num_cpu_blocks",   "watermark_blocks",
                                 "sliding_window_blocks",
                                 "enable_caching",   nullptr};
  long long bs, ngpu, ncpu, wm, window = -1;
  int caching = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwds, "LLLL|Lp", const_cast<char**>(kwlist), &bs, &ngpu,
          &ncpu, &wm, &window, &caching))
    return -1;
  PyEngine* self = reinterpret_cast<PyEngine*>(raw);
  delete self->engine;
  self->engine =
      new Engine(bs, ngpu, ncpu, wm, window, caching != 0);
  return 0;
}

void engine_dealloc(PyObject* raw) {
  PyEngine* self = reinterpret_cast<PyEngine*>(raw);
  delete self->engine;
  Py_TYPE(raw)->tp_free(raw);
}

Engine* get_engine(PyObject* raw) {
  PyEngine* self = reinterpret_cast<PyEngine*>(raw);
  if (!self->engine) {
    PyErr_SetString(PyExc_RuntimeError, "engine not initialized");
    return nullptr;
  }
  return self->engine;
}

bool parse_int_list(PyObject* obj, std::vector<int64_t>* out) {
  PyObject* fast = PySequence_Fast(obj, "expected a sequence of ints");
  if (!fast) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->resize(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    (*out)[i] = PyLong_AsLongLong(item);
    if ((*out)[i] == -1 && PyErr_Occurred()) {
      Py_DECREF(fast);
      return false;
    }
  }
  Py_DECREF(fast);
  return true;
}

#define ENGINE_GUARD(raw)                    \
  Engine* eng = get_engine(raw);             \
  if (!eng) return nullptr;

#define TRY_BEGIN try {
#define TRY_END                                        \
  } catch (const std::exception& e) {                  \
    PyErr_SetString(PyExc_ValueError, e.what());       \
    return nullptr;                                    \
  }

// can_allocate(num_required_blocks) -> 0 OK / 1 LATER / 2 NEVER
PyObject* py_can_allocate(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long required;
  if (!PyArg_ParseTuple(args, "L", &required)) return nullptr;
  if (eng->sliding_window_blocks >= 0 &&
      required > eng->sliding_window_blocks)
    required = eng->sliding_window_blocks;
  if (eng->num_total_gpu_blocks - required < eng->watermark_blocks)
    return PyLong_FromLong(2);
  if (eng->gpu.num_free() - required >= eng->watermark_blocks)
    return PyLong_FromLong(0);
  return PyLong_FromLong(1);
}

// allocate(seq_ids, num_prompt_blocks, hashes, hashed_tokens, group_refs)
PyObject* py_allocate(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject *seq_ids_obj, *hashes_obj, *hashed_obj;
  long long nblocks, group_refs;
  if (!PyArg_ParseTuple(args, "OLOOL", &seq_ids_obj, &nblocks,
                        &hashes_obj, &hashed_obj, &group_refs))
    return nullptr;
  std::vector<int64_t> seq_ids, hashes, hashed;
  if (!parse_int_list(seq_ids_obj, &seq_ids) ||
      !parse_int_list(hashes_obj, &hashes) ||
      !parse_int_list(hashed_obj, &hashed))
    return nullptr;
  TRY_BEGIN
  std::vector<Block*> table;
  table.reserve(nblocks);
  for (int64_t i = 0; i < nblocks; ++i) {
    Block* b;
    if (eng->sliding_window_blocks >= 0 &&
        i >= eng->sliding_window_blocks) {
      b = table[i % eng->sliding_window_blocks];
    } else if (eng->caching) {
      b = eng->gpu.allocate(hashes[i], hashed[i]);
    } else {
      b = eng->gpu.allocate();
      b->ref_count = static_cast<int32_t>(group_refs);
    }
    table.push_back(b);
  }
  for (int64_t sid : seq_ids) eng->tables[sid] = table;
  Py_RETURN_NONE;
  TRY_END
}

PyObject* py_can_append_slot(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long num_running;
  if (!PyArg_ParseTuple(args, "L", &num_running)) return nullptr;
  return PyBool_FromLong(num_running <= eng->gpu.num_free());
}

// num_need_append(seq_ids, n_logicals) -> count of sequences whose next
// token consumes a fresh device block: table shorter than its logical
// blocks (and not reusing a sliding-window slot), or a shared last
// block (copy-on-write).  Tables already extended by a lookahead window
// count zero — the worst-case per-seq bound was preempting groups whose
// next tokens were fully pre-reserved.
PyObject* py_num_need_append(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject *ids, *lens;
  if (!PyArg_ParseTuple(args, "OO", &ids, &lens)) return nullptr;
  TRY_BEGIN
  Py_ssize_t n = PyList_Size(ids);
  long need = 0;
  for (Py_ssize_t i = 0; i < n; ++i) {
    int64_t sid = PyLong_AsLongLong(PyList_GetItem(ids, i));
    int64_t n_logical = PyLong_AsLongLong(PyList_GetItem(lens, i));
    auto& table = eng->table(sid);
    if (static_cast<int64_t>(table.size()) < n_logical) {
      if (eng->sliding_window_blocks >= 0 &&
          static_cast<int64_t>(table.size()) >= eng->sliding_window_blocks)
        continue;
      ++need;
    } else if (!table.empty() && table.back()->ref_count > 1) {
      ++need;
    }
  }
  return PyLong_FromLong(need);
  TRY_END
}

// append_slot(seq_id, num_logical, last_full, full_hash, hashed_last)
//   -> None | (src, dst)
PyObject* py_append_slot(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid, n_logical, full_hash, hashed_last;
  int last_full;
  if (!PyArg_ParseTuple(args, "LLpLL", &sid, &n_logical, &last_full,
                        &full_hash, &hashed_last))
    return nullptr;
  TRY_BEGIN
  auto& table = eng->table(sid);
  auto alloc_last = [&]() -> Block* {
    if (!eng->caching) return eng->gpu.allocate();
    int64_t h = last_full ? full_hash : kNoHash;
    return eng->gpu.allocate(h, hashed_last);
  };

  if (static_cast<int64_t>(table.size()) < n_logical) {
    if (eng->sliding_window_blocks >= 0 &&
        static_cast<int64_t>(table.size()) >=
            eng->sliding_window_blocks) {
      table.push_back(table[table.size() % eng->sliding_window_blocks]);
    } else {
      table.push_back(alloc_last());
    }
    Py_RETURN_NONE;
  }

  Block* last = table.back();
  if (last->device != kDeviceTpu)
    throw std::runtime_error("append_slot on non-device block");
  if (last->ref_count == 1) {
    if (eng->caching && last_full) {
      // Promote the now-full block into the prefix cache.
      if (eng->gpu.contains_block(full_hash)) {
        eng->gpu.free_block(last);
        table.back() = eng->gpu.allocate(full_hash);
      } else {
        eng->gpu.update_hash(full_hash, last);
      }
    }
    Py_RETURN_NONE;
  }
  // Shared block: copy-on-write.
  Block* fresh = alloc_last();
  table.back() = fresh;
  eng->gpu.free_block(last);
  return Py_BuildValue("(ll)", static_cast<long>(last->number),
                       static_cast<long>(fresh->number));
  TRY_END
}

// extend_table(seq_id, target_pages) -> None
// Grow the block table to >= target_pages with plain (unhashed) device
// pages: the multi-step decode lookahead reservation (pages ahead of the
// sequence's logical blocks; see core/block_manager.py append_slots).
PyObject* py_extend_table(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid, target;
  if (!PyArg_ParseTuple(args, "LL", &sid, &target)) return nullptr;
  TRY_BEGIN
  auto& table = eng->table(sid);
  while (static_cast<int64_t>(table.size()) < target) {
    if (eng->sliding_window_blocks >= 0 &&
        static_cast<int64_t>(table.size()) >= eng->sliding_window_blocks) {
      table.push_back(table[table.size() % eng->sliding_window_blocks]);
    } else {
      table.push_back(eng->gpu.allocate());
    }
  }
  Py_RETURN_NONE;
  TRY_END
}

PyObject* py_fork(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long parent, child;
  if (!PyArg_ParseTuple(args, "LL", &parent, &child)) return nullptr;
  TRY_BEGIN
  auto& src = eng->table(parent);
  eng->tables[child] = src;
  std::unordered_set<Block*> uniq(src.begin(), src.end());
  for (Block* b : uniq) b->ref_count += 1;
  Py_RETURN_NONE;
  TRY_END
}

// Union of the groups' physical blocks (unfinished seqs only — caller
// filters).
size_t group_blocks(Engine* eng, const std::vector<int64_t>& seq_ids,
                    std::unordered_set<Block*>* out) {
  for (int64_t sid : seq_ids) {
    auto it = eng->tables.find(sid);
    if (it == eng->tables.end()) continue;
    out->insert(it->second.begin(), it->second.end());
  }
  return out->size();
}

PyObject* py_can_swap_in(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject* seq_ids_obj;
  long long num_swapped;
  if (!PyArg_ParseTuple(args, "OL", &seq_ids_obj, &num_swapped))
    return nullptr;
  std::vector<int64_t> seq_ids;
  if (!parse_int_list(seq_ids_obj, &seq_ids)) return nullptr;
  std::unordered_set<Block*> blocks;
  group_blocks(eng, seq_ids, &blocks);
  int64_t required =
      static_cast<int64_t>(blocks.size()) + num_swapped;
  return PyBool_FromLong(eng->gpu.num_free() - required >=
                         eng->watermark_blocks);
}

// swap_in(swapped_seq_ids) -> list[(cpu_block, gpu_block)]
PyObject* py_swap_in(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject* seq_ids_obj;
  if (!PyArg_ParseTuple(args, "O", &seq_ids_obj)) return nullptr;
  std::vector<int64_t> seq_ids;
  if (!parse_int_list(seq_ids_obj, &seq_ids)) return nullptr;
  TRY_BEGIN
  std::unordered_map<Block*, Block*> mapping;
  std::vector<std::pair<int32_t, int32_t>> pairs;
  for (int64_t sid : seq_ids) {
    auto& table = eng->table(sid);
    std::vector<Block*> fresh;
    fresh.reserve(table.size());
    for (Block* cpu_b : table) {
      auto it = mapping.find(cpu_b);
      Block* gpu_b;
      if (it != mapping.end()) {
        gpu_b = it->second;
        gpu_b->ref_count += 1;
      } else {
        gpu_b = eng->gpu.allocate(cpu_b->hash, cpu_b->num_hashed_tokens);
        mapping[cpu_b] = gpu_b;
        pairs.emplace_back(cpu_b->number, gpu_b->number);
      }
      fresh.push_back(gpu_b);
      eng->cpu.free_block(cpu_b);
    }
    table = std::move(fresh);
  }
  PyObject* out = PyList_New(pairs.size());
  for (size_t i = 0; i < pairs.size(); ++i)
    PyList_SET_ITEM(out, i,
                    Py_BuildValue("(ll)",
                                  static_cast<long>(pairs[i].first),
                                  static_cast<long>(pairs[i].second)));
  return out;
  TRY_END
}

PyObject* py_can_swap_out(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject* seq_ids_obj;
  if (!PyArg_ParseTuple(args, "O", &seq_ids_obj)) return nullptr;
  std::vector<int64_t> seq_ids;
  if (!parse_int_list(seq_ids_obj, &seq_ids)) return nullptr;
  std::unordered_set<Block*> blocks;
  group_blocks(eng, seq_ids, &blocks);
  return PyBool_FromLong(static_cast<int64_t>(blocks.size()) <=
                         eng->cpu.num_free());
}

// swap_out(running_seq_ids) -> list[(gpu_block, cpu_block)]
PyObject* py_swap_out(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  PyObject* seq_ids_obj;
  if (!PyArg_ParseTuple(args, "O", &seq_ids_obj)) return nullptr;
  std::vector<int64_t> seq_ids;
  if (!parse_int_list(seq_ids_obj, &seq_ids)) return nullptr;
  TRY_BEGIN
  std::unordered_map<Block*, Block*> mapping;
  std::vector<std::pair<int32_t, int32_t>> pairs;
  for (int64_t sid : seq_ids) {
    auto& table = eng->table(sid);
    std::vector<Block*> fresh;
    fresh.reserve(table.size());
    for (Block* gpu_b : table) {
      auto it = mapping.find(gpu_b);
      Block* cpu_b;
      if (it != mapping.end()) {
        cpu_b = it->second;
        cpu_b->ref_count += 1;
      } else {
        cpu_b = eng->cpu.allocate(gpu_b->hash, gpu_b->num_hashed_tokens);
        mapping[gpu_b] = cpu_b;
        pairs.emplace_back(gpu_b->number, cpu_b->number);
      }
      fresh.push_back(cpu_b);
      eng->gpu.free_block(gpu_b);
    }
    table = std::move(fresh);
  }
  PyObject* out = PyList_New(pairs.size());
  for (size_t i = 0; i < pairs.size(); ++i)
    PyList_SET_ITEM(out, i,
                    Py_BuildValue("(ll)",
                                  static_cast<long>(pairs[i].first),
                                  static_cast<long>(pairs[i].second)));
  return out;
  TRY_END
}

// Free a table's unique blocks in FIRST-OCCURRENCE order: freeing
// order decides free-list (and so future numbering) order, and must be
// deterministic and identical to the Python manager's
// dict.fromkeys(block_table) walk.
void free_table_blocks(Engine* eng, const std::vector<Block*>& table) {
  std::unordered_set<Block*> seen;
  for (Block* b : table) {
    if (!seen.insert(b).second) continue;
    if (b->device == kDeviceTpu)
      eng->gpu.free_block(b);
    else
      eng->cpu.free_block(b);
  }
}

PyObject* py_free_seq(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid;
  if (!PyArg_ParseTuple(args, "L", &sid)) return nullptr;
  TRY_BEGIN
  auto it = eng->tables.find(sid);
  if (it == eng->tables.end()) Py_RETURN_NONE;  // already freed
  free_table_blocks(eng, it->second);
  eng->tables.erase(it);
  Py_RETURN_NONE;
  TRY_END
}

PyObject* py_reset(PyObject* raw, PyObject*) {
  ENGINE_GUARD(raw);
  TRY_BEGIN
  for (auto& [sid, table] : eng->tables) free_table_blocks(eng, table);
  eng->tables.clear();
  Py_RETURN_NONE;
  TRY_END
}

PyObject* py_get_block_table(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid;
  if (!PyArg_ParseTuple(args, "L", &sid)) return nullptr;
  TRY_BEGIN
  auto& table = eng->table(sid);
  PyObject* out = PyList_New(table.size());
  for (size_t i = 0; i < table.size(); ++i)
    PyList_SET_ITEM(out, i,
                    PyLong_FromLong(static_cast<long>(table[i]->number)));
  return out;
  TRY_END
}

PyObject* py_has_seq(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid;
  if (!PyArg_ParseTuple(args, "L", &sid)) return nullptr;
  return PyBool_FromLong(eng->tables.count(sid) != 0);
}

PyObject* py_num_free_gpu(PyObject* raw, PyObject*) {
  ENGINE_GUARD(raw);
  return PyLong_FromLongLong(eng->gpu.num_free());
}

PyObject* py_num_free_cpu(PyObject* raw, PyObject*) {
  ENGINE_GUARD(raw);
  return PyLong_FromLongLong(eng->cpu.num_free());
}

PyObject* py_access_all(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid;
  double t;
  if (!PyArg_ParseTuple(args, "Ld", &sid, &t)) return nullptr;
  TRY_BEGIN
  for (Block* b : eng->table(sid)) b->last_accessed = t;
  Py_RETURN_NONE;
  TRY_END
}

// compute_full_blocks(seq_id, max_full_block)
PyObject* py_compute_full_blocks(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid, max_full;
  if (!PyArg_ParseTuple(args, "LL", &sid, &max_full)) return nullptr;
  auto it = eng->tables.find(sid);
  if (it == eng->tables.end()) Py_RETURN_NONE;
  if (max_full < 0) Py_RETURN_NONE;
  auto& table = it->second;
  for (int64_t i = max_full; i >= 0; --i) {
    if (table[i]->computed) break;
    table[i]->computed = true;
  }
  Py_RETURN_NONE;
}

// get_all_computed(seq_id) -> leading run of computed blocks (excluding
// the final, possibly partial, block)
PyObject* py_get_all_computed(PyObject* raw, PyObject* args) {
  ENGINE_GUARD(raw);
  long long sid;
  if (!PyArg_ParseTuple(args, "L", &sid)) return nullptr;
  auto it = eng->tables.find(sid);
  PyObject* out = PyList_New(0);
  if (it == eng->tables.end()) return out;
  auto& table = it->second;
  for (size_t i = 0; i + 1 < table.size(); ++i) {
    if (!table[i]->computed) break;
    PyObject* v = PyLong_FromLong(static_cast<long>(table[i]->number));
    PyList_Append(out, v);
    Py_DECREF(v);
  }
  return out;
}

PyMethodDef engine_methods[] = {
    {"can_allocate", py_can_allocate, METH_VARARGS, nullptr},
    {"allocate", py_allocate, METH_VARARGS, nullptr},
    {"can_append_slot", py_can_append_slot, METH_VARARGS, nullptr},
    {"num_need_append", py_num_need_append, METH_VARARGS, nullptr},
    {"append_slot", py_append_slot, METH_VARARGS, nullptr},
    {"extend_table", py_extend_table, METH_VARARGS, nullptr},
    {"fork", py_fork, METH_VARARGS, nullptr},
    {"can_swap_in", py_can_swap_in, METH_VARARGS, nullptr},
    {"swap_in", py_swap_in, METH_VARARGS, nullptr},
    {"can_swap_out", py_can_swap_out, METH_VARARGS, nullptr},
    {"swap_out", py_swap_out, METH_VARARGS, nullptr},
    {"free_seq", py_free_seq, METH_VARARGS, nullptr},
    {"reset", py_reset, METH_NOARGS, nullptr},
    {"get_block_table", py_get_block_table, METH_VARARGS, nullptr},
    {"has_seq", py_has_seq, METH_VARARGS, nullptr},
    {"num_free_gpu", py_num_free_gpu, METH_NOARGS, nullptr},
    {"num_free_cpu", py_num_free_cpu, METH_NOARGS, nullptr},
    {"access_all", py_access_all, METH_VARARGS, nullptr},
    {"compute_full_blocks", py_compute_full_blocks, METH_VARARGS,
     nullptr},
    {"get_all_computed", py_get_all_computed, METH_VARARGS, nullptr},
    {nullptr, nullptr, 0, nullptr},
};

PyTypeObject engine_type = [] {
  PyTypeObject t = {PyVarObject_HEAD_INIT(nullptr, 0)};
  t.tp_name = "_block_engine.BlockEngine";
  t.tp_basicsize = sizeof(PyEngine);
  t.tp_flags = Py_TPFLAGS_DEFAULT;
  t.tp_doc = "Native paged-block bookkeeping engine";
  t.tp_new = engine_new;
  t.tp_init = engine_init;
  t.tp_dealloc = engine_dealloc;
  t.tp_methods = engine_methods;
  return t;
}();

PyModuleDef module_def = {
    PyModuleDef_HEAD_INIT, "_block_engine",
    "Native paged KV-cache block engine", -1, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__block_engine(void) {
  if (PyType_Ready(&engine_type) < 0) return nullptr;
  PyObject* m = PyModule_Create(&module_def);
  if (!m) return nullptr;
  Py_INCREF(&engine_type);
  if (PyModule_AddObject(m, "BlockEngine",
                         reinterpret_cast<PyObject*>(&engine_type)) <
      0) {
    Py_DECREF(&engine_type);
    Py_DECREF(m);
    return nullptr;
  }
  return m;
}
