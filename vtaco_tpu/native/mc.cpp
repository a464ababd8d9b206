// Marching cubes host extension.
//
// Consumes a device-computed occupancy grid and extracts the isosurface
// with shared edge vertices (watertight on closed surfaces). Same cube
// numbering and tables as vtaco_tpu/generate/mc_tables.py (the build step
// generates mc_tables.h from that module so the two implementations cannot
// diverge). C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC mc.cpp -o libvtaco_mc.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "mc_tables.h"  // generated: MC_TRI_TABLE[256][16], MC_EDGE_TABLE[256]

namespace {

constexpr int kEdgeCorners[12][2] = {
    {0, 1}, {1, 2}, {2, 3}, {3, 0}, {4, 5}, {5, 6},
    {6, 7}, {7, 4}, {0, 4}, {1, 5}, {2, 6}, {3, 7},
};
constexpr int kCornerOffsets[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

struct Result {
  std::vector<float> verts;
  std::vector<int32_t> faces;
};

}  // namespace

extern "C" {

// Returns an opaque handle; query sizes and copy out, then free.
void* vtaco_mc_run(const float* vol, int nx, int ny, int nz, float level) {
  auto* res = new Result();
  auto val = [&](int x, int y, int z) -> float {
    return vol[(static_cast<int64_t>(x) * ny + y) * nz + z];
  };

  // edge key -> vertex index
  std::unordered_map<int64_t, int32_t> edge_vertex;
  edge_vertex.reserve(1 << 16);

  // per-edge (axis, origin-offset) derived from corner pairs
  int edge_axis[12];
  int edge_origin[12][3];
  for (int e = 0; e < 12; ++e) {
    const int* a = kCornerOffsets[kEdgeCorners[e][0]];
    const int* b = kCornerOffsets[kEdgeCorners[e][1]];
    for (int d = 0; d < 3; ++d) {
      edge_origin[e][d] = a[d] < b[d] ? a[d] : b[d];
      if (a[d] != b[d]) edge_axis[e] = d;
    }
  }

  auto vertex_for_edge = [&](int cx, int cy, int cz, int e) -> int32_t {
    int ox = cx + edge_origin[e][0];
    int oy = cy + edge_origin[e][1];
    int oz = cz + edge_origin[e][2];
    int axis = edge_axis[e];
    int64_t key = ((static_cast<int64_t>(ox) * ny + oy) * nz + oz) * 3 + axis;
    auto it = edge_vertex.find(key);
    if (it != edge_vertex.end()) return it->second;

    float p0[3] = {static_cast<float>(ox), static_cast<float>(oy),
                   static_cast<float>(oz)};
    int px = ox + (axis == 0), py = oy + (axis == 1), pz = oz + (axis == 2);
    float v0 = val(ox, oy, oz);
    float v1 = val(px, py, pz);
    float denom = v1 - v0;
    float t = (denom > 1e-12f || denom < -1e-12f) ? (level - v0) / denom : 0.5f;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    p0[axis] += t;

    int32_t idx = static_cast<int32_t>(res->verts.size() / 3);
    res->verts.push_back(p0[0]);
    res->verts.push_back(p0[1]);
    res->verts.push_back(p0[2]);
    edge_vertex.emplace(key, idx);
    return idx;
  };

  for (int x = 0; x + 1 < nx; ++x) {
    for (int y = 0; y + 1 < ny; ++y) {
      // hoist the 4 z-columns for the cell's corners
      for (int z = 0; z + 1 < nz; ++z) {
        int cube = 0;
        for (int c = 0; c < 8; ++c) {
          const int* o = kCornerOffsets[c];
          if (val(x + o[0], y + o[1], z + o[2]) > level) cube |= 1 << c;
        }
        if (cube == 0 || cube == 255) continue;
        const int16_t* tri = MC_TRI_TABLE[cube];
        for (int t = 0; t < 16 && tri[t] >= 0; t += 3) {
          int32_t i0 = vertex_for_edge(x, y, z, tri[t]);
          int32_t i1 = vertex_for_edge(x, y, z, tri[t + 1]);
          int32_t i2 = vertex_for_edge(x, y, z, tri[t + 2]);
          if (i0 == i1 || i1 == i2 || i0 == i2) continue;
          res->faces.push_back(i0);
          res->faces.push_back(i1);
          res->faces.push_back(i2);
        }
      }
    }
  }
  return res;
}

int64_t vtaco_mc_num_verts(void* handle) {
  return static_cast<Result*>(handle)->verts.size() / 3;
}
int64_t vtaco_mc_num_faces(void* handle) {
  return static_cast<Result*>(handle)->faces.size() / 3;
}
void vtaco_mc_copy(void* handle, float* verts_out, int32_t* faces_out) {
  auto* res = static_cast<Result*>(handle);
  std::memcpy(verts_out, res->verts.data(), res->verts.size() * sizeof(float));
  std::memcpy(faces_out, res->faces.data(), res->faces.size() * sizeof(int32_t));
}
void vtaco_mc_free(void* handle) { delete static_cast<Result*>(handle); }

}  // extern "C"
