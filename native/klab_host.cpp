// klab_host — native host-side runtime for the TPU framework.
//
// The reference's host hot path runs through native libraries: sentencepiece
// (C++) for tokenization and PIL's C decoders/resamplers for image prep
// (SURVEY.md §2C). This module is the framework's first-party equivalent:
//
//   * multithreaded uint8 image resize (bilinear + bicubic, matching
//     Pillow's convolution-based resampling semantics) feeding the on-device
//     normalize;
//   * a unigram (SentencePiece-style) Viterbi tokenizer core: metaspace
//     pre-tokenization, longest-path segmentation over a vocab trie,
//     batch encode with fixed-shape padding directly into caller buffers;
//   * epoch-seeded shuffle/shard index generation (the DistributedSampler
//     replacement) so the Python layer never materializes permutations.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native  (g++ -O3 -shared -fPIC -fopenmp)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Image resize (Pillow-compatible convolution resampling)
// ---------------------------------------------------------------------------

namespace {

struct FilterSpec {
  double support;
  double (*fn)(double);
};

double bilinear_filter(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Keys-cubic with a = -0.5 (Pillow's BICUBIC).
double bicubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precomputed 1-D resampling plan (Pillow's precompute_coeffs).
struct Plan {
  std::vector<int> bounds_lo;  // first source index per output pixel
  std::vector<int> counts;     // taps per output pixel
  std::vector<double> coeffs;  // flattened [out][tap]
  int ksize;
};

Plan make_plan(int in_size, int out_size, const FilterSpec& f) {
  Plan p;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  p.ksize = ksize;
  p.bounds_lo.resize(out_size);
  p.counts.resize(out_size);
  p.coeffs.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = static_cast<int>(center + support + 0.5);
    if (hi > in_size) hi = in_size;
    int n = hi - lo;
    double* k = &p.coeffs[static_cast<size_t>(xx) * ksize];
    double wsum = 0.0;
    for (int i = 0; i < n; ++i) {
      double w = f.fn((lo + i - center + 0.5) / filterscale);
      k[i] = w;
      wsum += w;
    }
    if (wsum != 0.0)
      for (int i = 0; i < n; ++i) k[i] /= wsum;
    p.bounds_lo[xx] = lo;
    p.counts[xx] = n;
  }
  return p;
}

inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return static_cast<uint8_t>(v + 0.5);
}

void resize_one(const uint8_t* src, int H, int W, uint8_t* dst, int h, int w,
                const Plan& px, const Plan& py) {
  // horizontal pass: (H, W, 3) -> (H, w, 3) in doubles
  std::vector<double> tmp(static_cast<size_t>(H) * w * 3);
  for (int y = 0; y < H; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * W * 3;
    double* orow = &tmp[static_cast<size_t>(y) * w * 3];
    for (int x = 0; x < w; ++x) {
      const double* k = &px.coeffs[static_cast<size_t>(x) * px.ksize];
      int lo = px.bounds_lo[x], n = px.counts[x];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* pix = row + static_cast<size_t>(lo + i) * 3;
        r += k[i] * pix[0];
        g += k[i] * pix[1];
        b += k[i] * pix[2];
      }
      orow[x * 3 + 0] = r;
      orow[x * 3 + 1] = g;
      orow[x * 3 + 2] = b;
    }
  }
  // vertical pass: (H, w, 3) -> (h, w, 3) uint8
  for (int y = 0; y < h; ++y) {
    const double* k = &py.coeffs[static_cast<size_t>(y) * py.ksize];
    int lo = py.bounds_lo[y], n = py.counts[y];
    uint8_t* orow = dst + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w * 3; ++x) {
      double acc = 0;
      for (int i = 0; i < n; ++i)
        acc += k[i] * tmp[static_cast<size_t>(lo + i) * w * 3 + x];
      orow[x] = clip8(acc);
    }
  }
}

}  // namespace

// Resize a batch of images. src: B x (H*W*3) uint8 (each image may have its
// own H/W given in dims[2*i], dims[2*i+1]); dst: B x (h*w*3).
// filter: 0 = bilinear, 1 = bicubic (Pillow default).
void klab_resize_batch(const uint8_t** src, const int* dims, int batch,
                       uint8_t* dst, int out_h, int out_w, int filter,
                       int n_threads) {
  FilterSpec f = filter == 0 ? FilterSpec{1.0, bilinear_filter}
                             : FilterSpec{2.0, bicubic_filter};
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency() / 2);
  // Group identical input sizes to share plans.
  std::unordered_map<int64_t, Plan> px_cache, py_cache;
  auto plan_for = [&](std::unordered_map<int64_t, Plan>& cache, int in_size,
                      int out_size) -> const Plan& {
    int64_t key = (static_cast<int64_t>(in_size) << 20) | out_size;
    auto it = cache.find(key);
    if (it == cache.end())
      it = cache.emplace(key, make_plan(in_size, out_size, f)).first;
    return it->second;
  };
  // Precompute all plans serially (cheap), then resize in parallel.
  for (int i = 0; i < batch; ++i) {
    plan_for(px_cache, dims[2 * i + 1], out_w);
    plan_for(py_cache, dims[2 * i], out_h);
  }
  std::vector<std::thread> threads;
  std::atomic_int next{0};
  size_t out_stride = static_cast<size_t>(out_h) * out_w * 3;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < batch) {
        const Plan& px = plan_for(px_cache, dims[2 * i + 1], out_w);
        const Plan& py = plan_for(py_cache, dims[2 * i], out_h);
        resize_one(src[i], dims[2 * i], dims[2 * i + 1], dst + i * out_stride,
                   out_h, out_w, px, py);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Unigram Viterbi tokenizer core
// ---------------------------------------------------------------------------

namespace {

struct UnigramModel {
  std::unordered_map<std::string, std::pair<int, float>> vocab;  // piece -> (id, logp)
  int max_piece_len = 1;
  int unk_id = 2;
  float unk_score = -20.0f;
};

std::vector<UnigramModel*> g_models;

}  // namespace

// Build a model from parallel arrays of pieces (utf-8, NUL-separated blob)
// and scores. Returns a handle.
int klab_tok_new(const char* pieces_blob, const float* scores, const int* ids,
                 int n, int unk_id) {
  auto* m = new UnigramModel();
  m->unk_id = unk_id;
  const char* p = pieces_blob;
  for (int i = 0; i < n; ++i) {
    std::string piece(p);
    p += piece.size() + 1;
    m->vocab[piece] = {ids[i], scores[i]};
    m->max_piece_len =
        std::max(m->max_piece_len, static_cast<int>(piece.size()));
  }
  g_models.push_back(m);
  return static_cast<int>(g_models.size()) - 1;
}

namespace {

// Viterbi segmentation of one pre-tokenized chunk (metaspace applied by the
// caller); writes ids, returns count (up to max_out).
int viterbi_encode(const UnigramModel& m, const std::string& text, int* out,
                   int max_out) {
  int n = static_cast<int>(text.size());
  if (n == 0) return 0;
  const float NEG = -1e30f;
  std::vector<float> best(n + 1, NEG);
  std::vector<int> back(n + 1, -1);     // start index of best last piece
  std::vector<int> back_id(n + 1, -1);  // its token id
  best[0] = 0.0f;
  for (int end = 1; end <= n; ++end) {
    int lo = std::max(0, end - m.max_piece_len);
    for (int start = lo; start < end; ++start) {
      if (best[start] <= NEG / 2) continue;
      auto it = m.vocab.find(text.substr(start, end - start));
      float score;
      int id;
      if (it != m.vocab.end()) {
        id = it->second.first;
        score = it->second.second;
      } else if (end - start == 1) {
        id = m.unk_id;
        score = m.unk_score;
      } else {
        continue;
      }
      float cand = best[start] + score;
      if (cand > best[end]) {
        best[end] = cand;
        back[end] = start;
        back_id[end] = id;
      }
    }
  }
  std::vector<int> rev;
  for (int pos = n; pos > 0; pos = back[pos]) rev.push_back(back_id[pos]);
  int cnt = std::min(static_cast<int>(rev.size()), max_out);
  for (int i = 0; i < cnt; ++i) out[i] = rev[rev.size() - 1 - i];
  return cnt;
}

}  // namespace

// Batch encode with fixed-shape padding. texts: NUL-separated utf-8 blob of
// `batch` strings. out_ids/out_mask: (batch, max_len) int32, pre-allocated.
// Metaspace pre-tokenization (' ' -> '\xe2\x96\x81') and a leading marker
// are applied here; eos appended; pad_id fills the remainder.
void klab_tok_encode_batch(int handle, const char* texts_blob, int batch,
                           int32_t* out_ids, int32_t* out_mask, int max_len,
                           int pad_id, int eos_id, int n_threads) {
  const UnigramModel& m = *g_models[handle];
  std::vector<const char*> starts(batch);
  const char* p = texts_blob;
  for (int i = 0; i < batch; ++i) {
    starts[i] = p;
    p += std::strlen(p) + 1;
  }
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency() / 2);
  std::vector<std::thread> threads;
  std::atomic_int next{0};
  for (int t = 0; t < std::min(n_threads, batch); ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < batch) {
        std::string s(starts[i]);
        // Metaspace: prepend marker, replace spaces with U+2581.
        std::string ms = "\xe2\x96\x81";
        for (char c : s) {
          if (c == ' ')
            ms += "\xe2\x96\x81";
          else
            ms += c;
        }
        int32_t* ids = out_ids + static_cast<size_t>(i) * max_len;
        int32_t* mask = out_mask + static_cast<size_t>(i) * max_len;
        std::vector<int> buf(max_len);
        int cnt = viterbi_encode(m, ms, buf.data(), max_len - 1);
        for (int j = 0; j < cnt; ++j) ids[j] = buf[j];
        ids[cnt] = eos_id;
        for (int j = 0; j <= cnt; ++j) mask[j] = 1;
        for (int j = cnt + 1; j < max_len; ++j) {
          ids[j] = pad_id;
          mask[j] = 0;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Shuffle/shard index generation (DistributedSampler replacement)
// ---------------------------------------------------------------------------

// Fisher-Yates with splitmix64, matching across hosts for a given seed.
// Writes this host's per-batch indices: (num_batches, local_batch).
void klab_epoch_indices(int64_t n, int64_t global_batch, int64_t seed,
                        int64_t epoch, int process_index, int process_count,
                        int64_t* out /* (n/global_batch) * local */) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  uint64_t s = static_cast<uint64_t>(seed) * 0x9E3779B97F4A7C15ull +
               static_cast<uint64_t>(epoch) + 0xBF58476D1CE4E5B9ull;
  auto rnd = [&]() {
    s += 0x9E3779B97F4A7C15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(rnd() % static_cast<uint64_t>(i + 1));
    std::swap(order[i], order[j]);
  }
  int64_t num_batches = n / global_batch;
  int64_t local = global_batch / process_count;
  for (int64_t b = 0; b < num_batches; ++b)
    for (int64_t i = 0; i < local; ++i)
      out[b * local + i] = order[b * global_batch + process_index * local + i];
}

}  // extern "C"
