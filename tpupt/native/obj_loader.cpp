// Native Wavefront OBJ parser.
//
// The reference loads models through Assimp in C++
// (src/lib/assets/model_loader.cpp:11-44).  This is the tpupt native
// equivalent: positions + fan-triangulated faces, negative indices
// supported, everything else skipped — ~20x the pure-python parser on
// large meshes.  Bound via ctypes; tpupt/scene/obj_loader.py falls back to
// python when the library isn't built.
//
// Two-call protocol (caller allocates):
//   tpupt_obj_count(path, &n_verts, &n_tris)      -> 0 or error
//   tpupt_obj_parse(path, positions, tris)        -> 0 or error

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Counts {
  int64_t verts = 0;
  int64_t tris = 0;
};

// Parses one face line's vertex indices ("f v", "f v/vt", "f v//vn", ...).
int parse_face(char* line, int64_t n_verts_so_far, std::vector<int64_t>& idx) {
  idx.clear();
  char* save = nullptr;
  for (char* tok = strtok_r(line + 2, " \t\r\n", &save); tok;
       tok = strtok_r(nullptr, " \t\r\n", &save)) {
    long v = strtol(tok, nullptr, 10);
    if (v == 0) return -1;
    idx.push_back(v > 0 ? v - 1 : n_verts_so_far + v);
  }
  return idx.size() >= 3 ? 0 : -1;
}

int scan(const char* path, Counts* counts, float* positions, int32_t* tris) {
  FILE* fh = fopen(path, "r");
  if (!fh) return -1;
  char line[4096];
  std::vector<int64_t> idx;
  int64_t nv = 0, nt = 0;
  while (fgets(line, sizeof line, fh)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      if (positions) {
        double x, y, z;
        if (sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) != 3) {
          fclose(fh);
          return -2;
        }
        positions[3 * nv] = (float)x;
        positions[3 * nv + 1] = (float)y;
        positions[3 * nv + 2] = (float)z;
      }
      ++nv;
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      if (parse_face(line, nv, idx) != 0) {
        fclose(fh);
        return -3;
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k) {  // fan triangulation
        if (tris) {
          tris[3 * nt] = (int32_t)idx[0];
          tris[3 * nt + 1] = (int32_t)idx[k];
          tris[3 * nt + 2] = (int32_t)idx[k + 1];
        }
        ++nt;
      }
    }
  }
  fclose(fh);
  if (counts) {
    counts->verts = nv;
    counts->tris = nt;
  }
  return 0;
}

}  // namespace

extern "C" {

int tpupt_obj_count(const char* path, int64_t* n_verts, int64_t* n_tris) {
  Counts c;
  int rc = scan(path, &c, nullptr, nullptr);
  if (rc != 0) return rc;
  *n_verts = c.verts;
  *n_tris = c.tris;
  return 0;
}

int tpupt_obj_parse(const char* path, float* positions, int32_t* tris) {
  return scan(path, nullptr, positions, tris);
}

}  // extern "C"
