// Permutohedral-lattice high-dimensional Gaussian filtering.
//
// Implements the lattice splat/blur/slice algorithm of Adams, Baek & Davis,
// "Fast High-Dimensional Filtering Using the Permutohedral Lattice"
// (Eurographics 2010) from the published algorithm description. This is the
// exact-backend replacement for the reference's pydensecrf dependency
// (reference src/crf.py uses pydensecrf's dense bilateral message passing):
// the mean-field CRF's bilateral term is one lattice filter per iteration.
//
// C ABI (ctypes-friendly):
//   permutohedral_filter(positions[N*pd], values[N*vd], out[N*vd], N, pd, vd)
// computes out_i = sum_j exp(-|p_i - p_j|^2 / 2) v_j  (approximately, with
// the lattice's built-in kernel normalization; positions should be
// pre-divided by the desired standard deviations).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys (pd+1 small ints).
struct KeyHash {
  size_t operator()(const std::vector<short>& k) const {
    size_t h = 0;
    for (short v : k) h = h * 2531011u + static_cast<size_t>(v + 32768);
    return h;
  }
};

struct Lattice {
  int pd;  // position dimensionality
  int vd;  // value dimensionality
  std::unordered_map<std::vector<short>, int, KeyHash> hash;
  std::vector<std::vector<short>> keys;   // key per lattice point
  std::vector<float> values;              // vd floats per lattice point

  explicit Lattice(int pd_, int vd_) : pd(pd_), vd(vd_) {}

  int lookup_or_insert(const std::vector<short>& key) {
    auto it = hash.find(key);
    if (it != hash.end()) return it->second;
    int idx = static_cast<int>(keys.size());
    hash.emplace(key, idx);
    keys.push_back(key);
    values.resize(values.size() + vd, 0.0f);
    return idx;
  }

  int lookup(const std::vector<short>& key) const {
    auto it = hash.find(key);
    return it == hash.end() ? -1 : it->second;
  }
};

}  // namespace

extern "C" void permutohedral_filter(const float* positions,
                                     const float* values_in, float* out,
                                     int n, int pd, int vd) {
  const int d1 = pd + 1;

  // Elevation scale factors. inv_std_dev makes a unit-variance Gaussian after
  // the three-tap [1 2 1]/4 blur along each of the pd+1 lattice axes.
  std::vector<float> scale_factor(pd);
  const float inv_std_dev = std::sqrt(2.0f / 3.0f) * d1;
  for (int i = 0; i < pd; ++i) {
    scale_factor[i] =
        inv_std_dev / std::sqrt(static_cast<float>((i + 1) * (i + 2)));
  }

  Lattice lattice(pd, vd);

  // Per-point splat data for the slice pass.
  std::vector<int> offsets(static_cast<size_t>(n) * d1);
  std::vector<float> barycentric_all(static_cast<size_t>(n) * d1);

  std::vector<float> elevated(d1);
  std::vector<int> rem0(d1);
  std::vector<int> rank(d1);
  std::vector<float> bary(d1 + 1);
  std::vector<short> key(d1);

  for (int p = 0; p < n; ++p) {
    const float* pos = positions + static_cast<size_t>(p) * pd;

    // 1) elevate into the hyperplane sum(x)=0 in R^{pd+1}
    float sm = 0.0f;
    for (int i = pd; i > 0; --i) {
      float cf = pos[i - 1] * scale_factor[i - 1];
      elevated[i] = sm - i * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // 2) nearest zero-colored lattice point: round to multiples of pd+1
    int sum = 0;
    for (int i = 0; i <= pd; ++i) {
      float v = elevated[i] / d1;
      int up = static_cast<int>(std::ceil(v)) * d1;
      int down = static_cast<int>(std::floor(v)) * d1;
      rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
      sum += rem0[i];
    }
    sum /= d1;

    // 3) rank differential coordinates
    for (int i = 0; i <= pd; ++i) rank[i] = 0;
    for (int i = 0; i < pd; ++i) {
      for (int j = i + 1; j <= pd; ++j) {
        if (elevated[i] - rem0[i] < elevated[j] - rem0[j])
          ++rank[i];
        else
          ++rank[j];
      }
    }

    // fix points that rounded onto the wrong simplex (sum != 0)
    for (int i = 0; i <= pd; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += d1;
        rem0[i] += d1;
      } else if (rank[i] > pd) {
        rank[i] -= d1;
        rem0[i] -= d1;
      }
    }

    // 4) barycentric coordinates
    for (int i = 0; i <= pd + 1; ++i) bary[i] = 0.0f;
    for (int i = 0; i <= pd; ++i) {
      float delta = (elevated[i] - rem0[i]) / d1;
      bary[pd - rank[i]] += delta;
      bary[pd + 1 - rank[i]] -= delta;
    }
    bary[0] += 1.0f + bary[pd + 1];

    // 5) splat to the pd+1 enclosing simplex vertices
    for (int remainder = 0; remainder <= pd; ++remainder) {
      for (int i = 0; i < pd; ++i) {
        key[i] = static_cast<short>(
            rem0[i] + (rank[i] >= d1 - remainder ? remainder - d1 : remainder));
      }
      // key[pd] is implied by sum=0; store only pd entries
      key[pd] = 0;
      std::vector<short> k(key.begin(), key.begin() + pd);
      int idx = lattice.lookup_or_insert(k);
      offsets[static_cast<size_t>(p) * d1 + remainder] = idx;
      barycentric_all[static_cast<size_t>(p) * d1 + remainder] =
          bary[remainder];
      float* lv = lattice.values.data() + static_cast<size_t>(idx) * vd;
      const float* v = values_in + static_cast<size_t>(p) * vd;
      float w = bary[remainder];
      for (int c = 0; c < vd; ++c) lv[c] += w * v[c];
    }
  }

  // 6) blur along each lattice direction with [1 2 1]/4 (in place over a
  // double buffer)
  const int n_lattice = static_cast<int>(lattice.keys.size());
  std::vector<float> new_values(lattice.values.size());
  std::vector<short> nkey(pd);
  for (int j = 0; j <= pd; ++j) {
    for (int i = 0; i < n_lattice; ++i) {
      const std::vector<short>& k = lattice.keys[i];
      // neighbors along axis j: key +/- (1,...,1, -pd at position j, 1,...)
      for (int dir = 0; dir < 2; ++dir) {
        int sgn = dir == 0 ? 1 : -1;
        for (int c = 0; c < pd; ++c) nkey[c] = k[c] + sgn;
        if (j < pd) nkey[j] = k[j] - sgn * pd;
        int ni = lattice.lookup(nkey);
        float* dst = new_values.data() + static_cast<size_t>(i) * vd;
        const float* self = lattice.values.data() + static_cast<size_t>(i) * vd;
        if (dir == 0) {
          for (int c = 0; c < vd; ++c) dst[c] = 0.5f * self[c];
        }
        if (ni >= 0) {
          const float* nv =
              lattice.values.data() + static_cast<size_t>(ni) * vd;
          for (int c = 0; c < vd; ++c) dst[c] += 0.25f * nv[c];
        }
      }
    }
    lattice.values.swap(new_values);
  }

  // 7) slice with the same barycentric weights
  const float alpha = 1.0f / (1.0f + std::pow(2.0f, -pd));
  for (int p = 0; p < n; ++p) {
    float* o = out + static_cast<size_t>(p) * vd;
    for (int c = 0; c < vd; ++c) o[c] = 0.0f;
    for (int remainder = 0; remainder <= pd; ++remainder) {
      int idx = offsets[static_cast<size_t>(p) * d1 + remainder];
      float w = barycentric_all[static_cast<size_t>(p) * d1 + remainder];
      const float* lv = lattice.values.data() + static_cast<size_t>(idx) * vd;
      for (int c = 0; c < vd; ++c) o[c] += alpha * w * lv[c];
    }
  }
}
