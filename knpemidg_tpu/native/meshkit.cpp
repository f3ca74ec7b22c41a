// Native host-runtime kernels for mesh construction (TPU-side equivalent of
// the DOLFIN C++ mesh core, SURVEY.md N1/N7).  The device compute path is
// JAX/XLA; these C++ kernels accelerate the one-time host build of the
// static index arrays (facet dedup/pairing dominates ingest for
// multi-million-cell meshes) and the Morton codes used for cell ordering.
//
// Exposed through a plain C ABI and loaded with ctypes (no pybind11).
// Build: g++ -O3 -march=native -shared -fPIC meshkit.cpp -o libmeshkit.so

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Facet record: up to 3 sorted vertex ids + owning (cell, local facet).
struct FacetRec {
  int64_t v[3];
  int64_t cell;
  int32_t loc;
};

// Build the unique-facet tables of a simplicial mesh.
//
//   cells     : int64[nc * (d+1)] vertex ids
//   if_verts  : out int64[max_f * d]    interior facet vertices (sorted)
//   if_ca/cb  : out int64[max_f]        the two adjacent cells
//   if_la/lb  : out int32[max_f]        local facet index in each cell
//   ef_verts  : out int64[max_f * d]    exterior facet vertices
//   ef_cell   : out int64[max_f], ef_loc: out int32[max_f]
//   n_if/n_ef : out counts
//
// Returns 0 on success, 1 on a non-manifold facet (shared by >2 cells).
int build_facets(const int64_t* cells, int64_t nc, int32_t d,
                 int64_t* if_verts, int64_t* if_ca, int64_t* if_cb,
                 int32_t* if_la, int32_t* if_lb,
                 int64_t* ef_verts, int64_t* ef_cell, int32_t* ef_loc,
                 int64_t* n_if, int64_t* n_ef) {
  const int nvc = d + 1;
  std::vector<FacetRec> recs;
  recs.resize(static_cast<size_t>(nc) * nvc);

  for (int64_t c = 0; c < nc; ++c) {
    const int64_t* cv = cells + c * nvc;
    for (int l = 0; l < nvc; ++l) {
      FacetRec& r = recs[static_cast<size_t>(c) * nvc + l];
      int k = 0;
      for (int j = 0; j < nvc; ++j)
        if (j != l) r.v[k++] = cv[j];
      for (; k < 3; ++k) r.v[k] = -1;
      std::sort(r.v, r.v + d);
      r.cell = c;
      r.loc = l;
    }
  }

  std::sort(recs.begin(), recs.end(), [](const FacetRec& a, const FacetRec& b) {
    if (a.v[0] != b.v[0]) return a.v[0] < b.v[0];
    if (a.v[1] != b.v[1]) return a.v[1] < b.v[1];
    return a.v[2] < b.v[2];
  });

  int64_t ni = 0, ne = 0;
  size_t i = 0, n = recs.size();
  while (i < n) {
    size_t j = i + 1;
    while (j < n && recs[j].v[0] == recs[i].v[0] && recs[j].v[1] == recs[i].v[1] &&
           recs[j].v[2] == recs[i].v[2])
      ++j;
    const size_t cnt = j - i;
    if (cnt == 2) {
      for (int k = 0; k < d; ++k) if_verts[ni * d + k] = recs[i].v[k];
      if_ca[ni] = recs[i].cell;
      if_cb[ni] = recs[i + 1].cell;
      if_la[ni] = recs[i].loc;
      if_lb[ni] = recs[i + 1].loc;
      ++ni;
    } else if (cnt == 1) {
      for (int k = 0; k < d; ++k) ef_verts[ne * d + k] = recs[i].v[k];
      ef_cell[ne] = recs[i].cell;
      ef_loc[ne] = recs[i].loc;
      ++ne;
    } else {
      return 1;  // non-manifold
    }
    i = j;
  }
  *n_if = ni;
  *n_ef = ne;
  return 0;
}

// Z-order (Morton) codes of points normalized into [0, 2^bits)^d.
void morton_codes(const double* pts, int64_t n, int32_t d, int32_t bits,
                  uint64_t* codes) {
  std::array<double, 3> lo{1e300, 1e300, 1e300}, hi{-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i)
    for (int32_t k = 0; k < d; ++k) {
      const double x = pts[i * d + k];
      lo[k] = std::min(lo[k], x);
      hi[k] = std::max(hi[k], x);
    }
  std::array<double, 3> scale{};
  const double maxq = static_cast<double>((1ull << bits) - 1);
  for (int32_t k = 0; k < d; ++k) {
    const double ext = hi[k] - lo[k];
    scale[k] = ext > 0 ? maxq / ext : 0.0;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint64_t code = 0;
    uint64_t q[3] = {0, 0, 0};
    for (int32_t k = 0; k < d; ++k) {
      double v = (pts[i * d + k] - lo[k]) * scale[k];
      if (v < 0) v = 0;
      if (v > maxq) v = maxq;
      q[k] = static_cast<uint64_t>(v);
    }
    for (int32_t b = 0; b < bits; ++b)
      for (int32_t k = 0; k < d; ++k)
        code |= ((q[k] >> b) & 1ull) << (static_cast<uint64_t>(b) * d + k);
    codes[i] = code;
  }
}

}  // extern "C"
