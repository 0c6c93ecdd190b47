// qtt_dataloader: native tokenized-corpus batch loader with background
// prefetch, exposed to Python via a C ABI (ctypes).
//
// The reference framework feeds its training loops through torch DataLoader
// worker processes (examples/*): the host-side input pipeline is native
// code there, and it must be here too — a Python loop materializing batch
// windows cannot keep a TPU fed at step times in the low milliseconds.
//
// Data model: a corpus file of raw little-endian int32 token ids.  An epoch
// is the set of non-overlapping (seq_len + 1) windows (input/label shift
// handled by the consumer), visited in a seeded Fisher-Yates shuffle so
// every window appears exactly once per epoch.  Worker threads fill a
// bounded ring of ready batches; qtl_next() blocks only when the ring is
// empty (i.e. the accelerator outruns the disk, not the Python glue).
//
// C ABI (see quantized_training_tpu/data/loader.py):
//   void* qtl_open(const char* path, long seq_len, long batch,
//                  unsigned long long seed, int n_threads);
//   long  qtl_num_batches(void* h);        // batches per epoch
//   int   qtl_next(void* h, int* out);     // out[batch * (seq_len+1)];
//                                          // 0 = ok, 1 = epoch ended (state
//                                          // reshuffled for the next epoch)
//   void  qtl_close(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Loader {
  std::vector<int32_t> tokens;
  long seq_len = 0;    // tokens per example = seq_len + 1 (input + shifted label)
  long batch = 0;
  long n_windows = 0;
  long n_batches = 0;

  std::vector<long> order;      // shuffled window indices for this epoch
  std::mt19937_64 rng;

  // prefetch ring, keyed by batch index: with several workers, fills finish
  // out of order, but the consumer must see batch 0, 1, 2, ... or the seeded
  // shuffle would not be reproducible across runs
  std::map<long, std::vector<int32_t>> ready;
  size_t max_ready = 8;
  long next_batch = 0;          // next batch index workers will claim
  long delivered = 0;           // batches handed to the consumer this epoch
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void shuffle_epoch() {
    for (long i = n_windows - 1; i > 0; --i) {
      long j = static_cast<long>(rng() % static_cast<uint64_t>(i + 1));
      std::swap(order[i], order[j]);
    }
  }

  void fill(std::vector<int32_t>& buf, long b) {
    const long ex = seq_len + 1;
    buf.resize(batch * ex);
    for (long i = 0; i < batch; ++i) {
      long w = order[(b * batch + i) % n_windows];
      std::memcpy(buf.data() + i * ex, tokens.data() + w * ex,
                  ex * sizeof(int32_t));
    }
  }

  void worker() {
    while (true) {
      long b;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (ready.size() < max_ready && next_batch < n_batches);
        });
        if (stop) return;
        b = next_batch++;
      }
      std::vector<int32_t> buf;
      fill(buf, b);
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.emplace(b, std::move(buf));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* qtl_open(const char* path, long seq_len, long batch,
               unsigned long long seed, int n_threads) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  auto* L = new Loader();
  L->tokens.resize(bytes / sizeof(int32_t));
  size_t got = std::fread(L->tokens.data(), sizeof(int32_t),
                          L->tokens.size(), f);
  std::fclose(f);
  L->tokens.resize(got);
  L->seq_len = seq_len;
  L->batch = batch;
  const long ex = seq_len + 1;
  L->n_windows = static_cast<long>(L->tokens.size()) / ex;
  if (L->n_windows < 1 || batch < 1) {
    delete L;
    return nullptr;
  }
  L->n_batches = L->n_windows / batch;  // drop the ragged tail
  if (L->n_batches < 1) L->n_batches = 1;
  L->order.resize(L->n_windows);
  for (long i = 0; i < L->n_windows; ++i) L->order[i] = i;
  L->rng.seed(seed);
  L->shuffle_epoch();
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

long qtl_num_batches(void* h) {
  return h ? static_cast<Loader*>(h)->n_batches : -1;
}

int qtl_next(void* h, int32_t* out) {
  auto* L = static_cast<Loader*>(h);
  std::vector<int32_t> buf;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (L->delivered >= L->n_batches) {
      // epoch boundary: reshuffle and restart counters
      L->delivered = 0;
      L->next_batch = 0;
      L->ready.clear();
      L->shuffle_epoch();
      L->cv_space.notify_all();
      return 1;
    }
    // wait specifically for the next in-order batch (workers may have
    // finished later ones first)
    L->cv_ready.wait(lk, [&] { return L->ready.count(L->delivered) != 0; });
    auto it = L->ready.find(L->delivered);
    buf = std::move(it->second);
    L->ready.erase(it);
    L->delivered++;
  }
  L->cv_space.notify_all();
  std::memcpy(out, buf.data(), buf.size() * sizeof(int32_t));
  return 0;
}

void qtl_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
