// Async batch assembler — first-party native analog of the reference's
// torch DataLoader worker pool (sotasum/data_modules.py:287-321 builds
// torch DataLoaders whose C++ workers collate batches off the training
// thread). Here the tokenized dataset is a set of fixed-shape row-major
// arrays; a background thread gathers shuffled rows into a ring of
// preallocated batch buffers so host batch assembly overlaps device
// execution. Single producer (worker) / single consumer (train loop).
//
// Exposed as a C API for the ctypes binding in
// retrieval_augmented_mds_tpu/data/native_loader.py.

#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Field {
  const uint8_t* base;   // [n_rows, row_nbytes] row-major source
  int64_t row_nbytes;
};

struct Loader {
  std::vector<Field> fields;
  std::vector<int64_t> order;     // row indices, already shuffled/trimmed
  int64_t n_rows = 0;
  int32_t batch_size = 0;
  int32_t n_slots = 0;
  int64_t n_batches = 0;

  // slot_buffers[slot][field] -> caller-owned batch buffer (numpy arrays
  // on the Python side, so yielded views outlive the loader)
  std::vector<std::vector<uint8_t*>> slot_buffers;

  std::mutex mu;
  std::condition_variable cv_free;   // signalled when a slot is released
  std::condition_variable cv_ready;  // signalled when a slot is filled
  std::vector<int64_t> ready_batch;  // per slot: batch id filled, -1 = free
  std::vector<bool> in_use;          // handed to the consumer
  int64_t next_produce = 0;          // next batch id the worker fills
  int64_t next_consume = 0;          // next batch id the consumer expects
  bool stop = false;

  std::thread worker;
};

void fill_slot(Loader* L, int32_t slot, int64_t batch) {
  const int64_t start = batch * L->batch_size;
  for (size_t f = 0; f < L->fields.size(); ++f) {
    const Field& fd = L->fields[f];
    uint8_t* dst = L->slot_buffers[slot][f];
    for (int32_t i = 0; i < L->batch_size; ++i) {
      const int64_t row = L->order[start + i];
      std::memcpy(dst + int64_t(i) * fd.row_nbytes,
                  fd.base + row * fd.row_nbytes,
                  size_t(fd.row_nbytes));
    }
  }
}

void worker_main(Loader* L) {
  for (;;) {
    int32_t slot = -1;
    int64_t batch = -1;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_free.wait(lk, [L, &slot] {
        if (L->stop) return true;
        for (int32_t s = 0; s < L->n_slots; ++s) {
          if (L->ready_batch[s] < 0 && !L->in_use[s]) {
            slot = s;
            return true;
          }
        }
        return false;
      });
      if (L->stop || L->next_produce >= L->n_batches) return;
      batch = L->next_produce++;
    }
    fill_slot(L, slot, batch);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->ready_batch[slot] = batch;
    }
    L->cv_ready.notify_one();
  }
}

}  // namespace

extern "C" {

// field_ptrs: n_fields base pointers; row_nbytes: per-field row stride.
// order: n_order shuffled row indices (n_order must be a multiple of
// batch_size — trim drop_last in the caller). n_slots >= 2 gives the
// worker headroom to run ahead of the consumer. slot_ptrs: caller-owned
// output buffers, laid out [slot * n_fields + field], each of size
// batch_size * row_nbytes[field] — the loader never allocates or frees
// them, so consumers may keep views after the loader is destroyed.
void* batch_loader_create(const void** field_ptrs, const int64_t* row_nbytes,
                          int32_t n_fields, int64_t n_rows,
                          const int64_t* order, int64_t n_order,
                          int32_t batch_size, int32_t n_slots,
                          void** slot_ptrs) {
  if (n_fields <= 0 || batch_size <= 0 || n_slots < 1 ||
      n_order % batch_size != 0) {
    return nullptr;
  }
  Loader* L = new Loader();
  L->fields.resize(n_fields);
  for (int32_t f = 0; f < n_fields; ++f) {
    L->fields[f].base = static_cast<const uint8_t*>(field_ptrs[f]);
    L->fields[f].row_nbytes = row_nbytes[f];
  }
  L->order.assign(order, order + n_order);
  L->n_rows = n_rows;
  L->batch_size = batch_size;
  L->n_slots = n_slots;
  L->n_batches = n_order / batch_size;
  L->slot_buffers.resize(n_slots);
  for (int32_t s = 0; s < n_slots; ++s) {
    L->slot_buffers[s].resize(n_fields);
    for (int32_t f = 0; f < n_fields; ++f) {
      L->slot_buffers[s][f] =
          static_cast<uint8_t*>(slot_ptrs[s * n_fields + f]);
    }
  }
  L->ready_batch.assign(n_slots, -1);
  L->in_use.assign(n_slots, false);
  L->worker = std::thread(worker_main, L);
  return L;
}

int64_t batch_loader_n_batches(void* handle) {
  return static_cast<Loader*>(handle)->n_batches;
}

// Blocks until the next batch (in order) is assembled. Returns the slot
// index holding it, or -1 when the epoch is exhausted. The slot stays
// valid until batch_loader_release(slot).
int32_t batch_loader_next(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_consume >= L->n_batches) return -1;
  const int64_t want = L->next_consume;
  int32_t slot = -1;
  L->cv_ready.wait(lk, [L, want, &slot] {
    for (int32_t s = 0; s < L->n_slots; ++s) {
      if (L->ready_batch[s] == want) {
        slot = s;
        return true;
      }
    }
    return L->stop;
  });
  if (slot < 0) return -1;
  L->in_use[slot] = true;
  L->next_consume++;
  return slot;
}

void batch_loader_release(void* handle, int32_t slot) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->ready_batch[slot] = -1;
    L->in_use[slot] = false;
  }
  L->cv_free.notify_one();
}

void batch_loader_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;  // slot buffers are caller-owned
}

}  // extern "C"
