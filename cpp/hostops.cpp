// Native host-side data-path kernels.
//
// The reference keeps its hot device kernels in CUDA and leaves the host
// data path (per-epoch chunk generation, metric voxelization, coordinate
// dedup) in pure numpy (lib/dataset.py:204-252, lib/pc_util.py:39-51,
// scripts/eval.py:40-46). On TPU the device side moved to XLA/Pallas; this
// file is the native equivalent for the HOST hot loops, which otherwise
// throttle the input pipeline at 1201 scenes/epoch:
//
//   - chunk_scan: one fused pass over a scene computing the crop mask, the
//     annotated-point count, and the 31x31x62 voxel occupancy of the tight
//     crop (numpy needs several passes plus a sort-based unique).
//   - voxel_first_occurrence: 0.02m surface-voxel dedup via open-addressing
//     hash, O(N) (numpy: O(N log N) sort in np.unique).
//   - coord_first_occurrence: exact-row coordinate dedup, O(N).
//   - voxelize_unique: voxel-id computation fused into the hash unique
//     (numpy-promotion-exact; utils/voxel.py).
//   - dedup_voxelize: coordinate dedup + voxel first-occurrence in ONE
//     pass — the per-scene metric front half (engine/metrics.py).
//
// Built as a plain shared library (no Python headers); bound via ctypes in
// pointnet2_scannet_tpu/utils/native.py with a numpy fallback when the
// library has not been compiled.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// One fused scan used by the chunk-validity loop (lib/dataset.py:219-240
// semantics). Returns the number of points inside [lo-margin, hi+margin];
// fills mask_out (uint8, length n). Outputs:
//   annotated_out: #points inside crop with label > 0
//   occupied_out:  #distinct occupied voxels of the 31x31x62 grid over the
//                  TIGHT crop ([lo-0.01, hi+0.01]), voxel id formula
//                  ceil((p-lo)/(hi-lo)*[31,31,62]) as in dataset.py:236-238
int64_t chunk_scan(const float* xyz,       // (n, 3) row-major
                   const float* labels,    // (n,) semantic labels
                   int64_t n,
                   const float* lo,        // (3,) crop min (curmin)
                   const float* hi,        // (3,) crop max (curmax)
                   float margin,           // crop slack (0.2)
                   uint8_t* mask_out,      // (n,) 1 = inside loose crop
                   int64_t* annotated_out,
                   int64_t* occupied_out) {
  int64_t inside = 0, annotated = 0;
  const float tight = 0.01f;
  // voxel coords run 0..32 per xy axis and 0..62 in z (the tight crop
  // extends 0.01 past hi, so ceil can land one cell beyond the grid) —
  // max linear id 32*31*62 + 32*62 + 62 = 63550; the same out-of-grid and
  // collision behavior numpy's linear-id formula has is replicated exactly
  std::vector<uint8_t> vox(65536, 0);
  int64_t occupied = 0;
  const float ex = hi[0] - lo[0], ey = hi[1] - lo[1], ez = hi[2] - lo[2];
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[i * 3], y = xyz[i * 3 + 1], z = xyz[i * 3 + 2];
    const bool in_loose = x >= lo[0] - margin && x <= hi[0] + margin &&
                          y >= lo[1] - margin && y <= hi[1] + margin &&
                          z >= lo[2] - margin && z <= hi[2] + margin;
    mask_out[i] = in_loose ? 1 : 0;
    if (!in_loose) continue;
    ++inside;
    if (labels[i] > 0.0f) ++annotated;
    const bool in_tight = x >= lo[0] - tight && x <= hi[0] + tight &&
                          y >= lo[1] - tight && y <= hi[1] + tight &&
                          z >= lo[2] - tight && z <= hi[2] + tight;
    if (in_tight && ex > 0 && ey > 0 && ez > 0) {
      // match numpy bit-for-bit: (p - lo)/extent evaluates in float32 (the
      // inputs' dtype), the *[31,31,62] multiply and ceil in float64
      auto cdim = [](float v, float l, float e, double s) {
        const float r = (v - l) / e;
        const double t = (double)r * s;
        int64_t c = (int64_t)t;          // trunc toward zero == ceil for t<=0
        if (t > 0 && (double)c < t) ++c; // ceil for positive t
        return c;
      };
      int64_t vx = cdim(x, lo[0], ex, 31.0);
      int64_t vy = cdim(y, lo[1], ey, 31.0);
      int64_t vz = cdim(z, lo[2], ez, 62.0);
      int64_t id = vx * 31 * 62 + vy * 62 + vz;
      if (id >= 0 && id < (int64_t)vox.size() && !vox[id]) {
        vox[id] = 1;
        ++occupied;
      }
    }
  }
  *annotated_out = annotated;
  *occupied_out = occupied;
  return inside;
}

// Whole-scene column tiler (lib/dataset.py:316-337 semantics): assign every
// point to the 1.5m x 1.5m xy columns whose +-tol-expanded bounds contain it
// (a point near a border belongs to up to 4 columns, exactly like the
// reference's per-column mask loop). One O(n) binned pass instead of the
// numpy nx*ny full-scene scans. Bounds arithmetic replicates numpy's dtype
// promotion: curmin/curmax are float64 (f32 coordmin + python-float offsets),
// points are f32 promoted to f64 for the compare.
//
// counts: (nx*ny) member counts, row-major (i*ny + j) — the reference's
//   iteration order. members: member point indices grouped by column in that
//   order, ascending within each column; capacity must be >= 4n.
// Returns the total member count.
int64_t tile_columns(const float* xyz, int64_t n,
                     const float* coordmin,  // (3,) f32 scene min
                     float zextent,          // f32(coordmax_z - coordmin_z)
                     double L, double tol,
                     int64_t nx, int64_t ny,
                     int64_t* counts, int64_t* members) {
  // The bi±1/bj±1 neighbor scan and the caller's 4n `members` capacity are
  // only valid for tol < L/2 (a column's ±tol-expanded width stays < 2L, so a
  // point lands in at most 2 columns per axis). Refuse wider tolerances —
  // the caller falls back to the exact O(nx*ny*n) path.
  if (!(tol * 2.0 < L)) return -1;
  const double c0 = (double)coordmin[0];
  const double c1 = (double)coordmin[1];
  const double zlo = (double)coordmin[2] - tol;
  const double zhi = (double)coordmin[2] + (double)zextent + tol;
  const int64_t ncols = nx * ny;
  for (int64_t c = 0; c < ncols; ++c) counts[c] = 0;

  auto visit = [&](int64_t i, auto&& fn) {
    const double x = (double)xyz[i * 3];
    const double y = (double)xyz[i * 3 + 1];
    const double z = (double)xyz[i * 3 + 2];
    if (z < zlo || z > zhi) return;
    const int64_t bi = (int64_t)((x - c0) / L);
    const int64_t bj = (int64_t)((y - c1) / L);
    for (int64_t ci = bi - 1; ci <= bi + 1; ++ci) {
      if (ci < 0 || ci >= nx) continue;
      if (x < c0 + (double)ci * L - tol) continue;
      if (x > c0 + (double)(ci + 1) * L + tol) continue;
      for (int64_t cj = bj - 1; cj <= bj + 1; ++cj) {
        if (cj < 0 || cj >= ny) continue;
        if (y < c1 + (double)cj * L - tol) continue;
        if (y > c1 + (double)(cj + 1) * L + tol) continue;
        fn(ci * ny + cj);
      }
    }
  };

  for (int64_t i = 0; i < n; ++i)
    visit(i, [&](int64_t col) { ++counts[col]; });
  std::vector<int64_t> cursor(ncols);
  int64_t off = 0;
  for (int64_t c = 0; c < ncols; ++c) {
    cursor[c] = off;
    off += counts[c];
  }
  for (int64_t i = 0; i < n; ++i)
    visit(i, [&](int64_t col) { members[cursor[col]++] = i; });
  return off;
}

static inline uint64_t mix64(uint64_t h) {
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33;
  return h;
}

// First-occurrence unique over int64 keys (open addressing), preserving the
// reference's representative-point semantics (pc_util.py:39-51 via
// np.unique(return_index) = first occurrence). Writes the indices of first
// occurrences into out_idx (capacity n) and returns their count. out_idx is
// emitted in ascending KEY order? No — np.unique sorts by key; the metric
// formulas only compare label columns voxel-by-voxel and intersect uvidx
// sets, so ORDER must pair (uvidx, uvlabel) consistently. We emit in
// first-encounter order together with the keys; the Python wrapper sorts by
// key to match np.unique exactly.
int64_t unique_first_occurrence(const int64_t* keys, int64_t n,
                                int64_t* out_idx, int64_t* out_keys) {
  // table size: next power of two >= 2n
  uint64_t cap = 16;
  while (cap < (uint64_t)(n * 2 + 1)) cap <<= 1;
  std::vector<int64_t> slot(cap, -1);  // stores index into keys[]
  const uint64_t maskc = cap - 1;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t k = keys[i];
    uint64_t h = mix64((uint64_t)k) & maskc;
    for (;;) {
      int64_t s = slot[h];
      if (s == -1) {
        slot[h] = i;
        out_idx[count] = i;
        out_keys[count] = k;
        ++count;
        break;
      }
      if (keys[s] == k) break;  // already seen; first occurrence kept
      h = (h + 1) & maskc;
    }
  }
  return count;
}

// Fused voxel-id computation + first-occurrence unique for the surface-voxel
// metrics (utils/voxel.py, reference lib/pc_util.py:39-51). The key formula
// replicates numpy's dtype promotion EXACTLY: every op stays float32 — an
// f32 array divided by a python float keeps f32 under both legacy and NEP-50
// promotion — so subtract, divide, ceil, and the left-to-right id
// accumulation v0 + v1*nx + (v2*nx)*ny all round per-op in f32 (the Makefile
// pins -ffp-contract=off so no FMA fuses them), then truncate to int64.
// nvox arrives as double[3] but is an exact f32->f64 widening; casting back
// recovers the original f32 grid dims.
int64_t voxelize_unique(const float* coords, int64_t n, double res,
                        const float* coordmin, const double* nvox,
                        int64_t* out_idx, int64_t* out_keys) {
  std::vector<int64_t> keys((size_t)n);
  const float fres = (float)res;
  const float nx = (float)nvox[0];
  const float ny = (float)nvox[1];
  for (int64_t i = 0; i < n; ++i) {
    const float dx = coords[i * 3] - coordmin[0];
    const float dy = coords[i * 3 + 1] - coordmin[1];
    const float dz = coords[i * 3 + 2] - coordmin[2];
    const float v0 = std::ceil(dx / fres);
    const float v1 = std::ceil(dy / fres);
    const float v2 = std::ceil(dz / fres);
    keys[(size_t)i] = (int64_t)(v0 + v1 * nx + (v2 * nx) * ny);
  }
  return unique_first_occurrence(keys.data(), n, out_idx, out_keys);
}

// Exact-row coordinate dedup (first occurrence), the scripts/eval.py:40-46
// filter. Treats each (x,y,z) float32 row as a 96-bit key.
int64_t coord_first_occurrence(const float* coords, int64_t n,
                               int64_t* out_idx) {
  uint64_t cap = 16;
  while (cap < (uint64_t)(n * 2 + 1)) cap <<= 1;
  std::vector<int64_t> slot(cap, -1);
  const uint64_t maskc = cap - 1;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t a, b, c;
    std::memcpy(&a, coords + i * 3, 4);
    std::memcpy(&b, coords + i * 3 + 1, 4);
    std::memcpy(&c, coords + i * 3 + 2, 4);
    const uint64_t k1 = ((uint64_t)a << 32) | b;
    uint64_t h = mix64(k1 ^ mix64((uint64_t)c)) & maskc;
    for (;;) {
      int64_t s = slot[h];
      if (s == -1) {
        slot[h] = i;
        out_idx[count++] = i;
        break;
      }
      if (std::memcmp(coords + s * 3, coords + i * 3, 12) == 0) break;
      h = (h + 1) & maskc;
    }
  }
  return count;
}

// One fused pass for the per-scene metric front half: exact-row coordinate
// dedup (first occurrence, ascending original index — scripts/eval.py:40-46)
// AND surface-voxel first-occurrence over the SURVIVING rows (pc_util.py:
// 39-51 semantics: np.unique(return_index) over voxel ids of the deduped
// sequence). Voxel-id math matches numpy promotion exactly (see
// voxelize_unique). Outputs:
//   keep_idx  (cap n): original indices of deduped rows, ascending
//   vox_idx   (cap n): original index of each voxel's representative row
// Returns m1 (dedup count); *vox_count gets m2. vox_idx order is
// first-encounter (metric formulas are order-invariant over voxels).
int64_t dedup_voxelize(const float* coords, int64_t n, double res,
                       const float* coordmin, const double* nvox,
                       int64_t* keep_idx, int64_t* vox_idx,
                       int64_t* vox_count) {
  uint64_t cap = 16;
  while (cap < (uint64_t)(n * 2 + 1)) cap <<= 1;
  std::vector<int64_t> cslot(cap, -1);   // coord table: index into coords
  std::vector<int64_t> vslot(cap, -1);   // voxel table: index into vkeys
  std::vector<int64_t> vkeys;
  vkeys.reserve((size_t)n / 4 + 16);
  const uint64_t maskc = cap - 1;
  const float fres = (float)res;
  const float nx = (float)nvox[0];
  const float ny = (float)nvox[1];
  int64_t m1 = 0, m2 = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t a, b, c;
    std::memcpy(&a, coords + i * 3, 4);
    std::memcpy(&b, coords + i * 3 + 1, 4);
    std::memcpy(&c, coords + i * 3 + 2, 4);
    const uint64_t k1 = ((uint64_t)a << 32) | b;
    uint64_t h = mix64(k1 ^ mix64((uint64_t)c)) & maskc;
    bool fresh = false;
    for (;;) {
      int64_t s = cslot[h];
      if (s == -1) {
        cslot[h] = i;
        keep_idx[m1++] = i;
        fresh = true;
        break;
      }
      if (std::memcmp(coords + s * 3, coords + i * 3, 12) == 0) break;
      h = (h + 1) & maskc;
    }
    if (!fresh) continue;
    const float dx = coords[i * 3] - coordmin[0];
    const float dy = coords[i * 3 + 1] - coordmin[1];
    const float dz = coords[i * 3 + 2] - coordmin[2];
    const float v0 = std::ceil(dx / fres);
    const float v1 = std::ceil(dy / fres);
    const float v2 = std::ceil(dz / fres);
    const int64_t key = (int64_t)(v0 + v1 * nx + (v2 * nx) * ny);
    uint64_t hv = mix64((uint64_t)key) & maskc;
    for (;;) {
      int64_t s = vslot[hv];
      if (s == -1) {
        vslot[hv] = (int64_t)vkeys.size();
        vkeys.push_back(key);
        vox_idx[m2++] = i;
        break;
      }
      if (vkeys[(size_t)s] == key) break;
      hv = (hv + 1) & maskc;
    }
  }
  *vox_count = m2;
  return m1;
}

}  // extern "C"
