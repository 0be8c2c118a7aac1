// Native scene loader for raytracingc_tpu.
//
// A from-scratch C++ re-implementation of the ingest layer with the same
// behavioral contract as the reference C loader (objloader.c / raytracing.c
// in Atsuyo64/RayTracingC) and as the pure-Python fallback in
// raytracingc_tpu/scene/obj_loader.py:
//
//   * `v`/`vn` are 1-indexed; faces only in `f v/vt/vn` triplet form
//     (objloader.c:488); `f v//vn` is a hard error (objloader.c:518-521);
//     faces with >3 vertex groups are truncated to the first three (sscanf
//     semantics); flat shading from the FIRST vertex's vn (objloader.c:499).
//   * `mtllib` resolves relative to the .obj's directory
//     (objloader.c:342-345); a missing .mtl is a warning, not an error
//     (objloader.c:234-240); unknown `usemtl` -> default material (white,
//     emission 0, smoothness 0).
//   * MTL mapping (objloader.c:246-306): Kd -> albedo, Ke -> FIRST component
//     as scalar emission, Ns -> smoothness = sqrt(0.001 * Ns).
//   * triangles.txt (raytracing.c:19-98): every char not in [0-9 - . + \n]
//     becomes a space, `//` line comments stripped, then count + 14 floats
//     per triangle; CCW normal normalize(cross(B-A, C-A)).
//
// Exposed as a minimal C ABI for ctypes (no pybind11 in this image). All
// output arrays are malloc'd by the library and released via rtc_free.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Material {
  std::string name;
  float albedo[3] = {1.0f, 1.0f, 1.0f};
  float emission = 0.0f;
  float smoothness = 0.0f;
};

struct Out {
  std::vector<float> verts;       // T * 9
  std::vector<float> normals;     // T * 3
  std::vector<float> albedo;      // T * 3
  std::vector<float> emission;    // T
  std::vector<float> smoothness;  // T
};

void set_err(char* errbuf, int errlen, const std::string& msg) {
  if (errbuf && errlen > 0) {
    std::snprintf(errbuf, static_cast<size_t>(errlen), "%s", msg.c_str());
  }
}

std::string dirname_of(const std::string& path) {
  size_t pos = path.find_last_of("/\\");
  return pos == std::string::npos ? std::string(".") : path.substr(0, pos);
}

bool starts_with(const char* s, const char* prefix) {
  return std::strncmp(s, prefix, std::strlen(prefix)) == 0;
}

// Split a line into whitespace-separated tokens (in place, like strtok).
std::vector<char*> tokenize(char* line) {
  std::vector<char*> toks;
  for (char* t = std::strtok(line, " \t\r\n"); t; t = std::strtok(nullptr, " \t\r\n")) {
    toks.push_back(t);
  }
  return toks;
}

std::vector<Material> load_mtl(const std::string& path) {
  std::vector<Material> mats;
  FILE* fh = std::fopen(path.c_str(), "r");
  if (!fh) {
    // Missing MTL is a warning in the reference (objloader.c:234-240).
    std::fprintf(stderr, "WARNING: No material found (%s).\n", path.c_str());
    return mats;
  }
  char line[4096];
  while (std::fgets(line, sizeof line, fh)) {
    auto toks = tokenize(line);
    if (toks.empty() || toks[0][0] == '#') continue;
    if (!std::strcmp(toks[0], "newmtl") && toks.size() >= 2) {
      Material m;
      m.name = toks[1];
      mats.push_back(m);
    } else if (mats.empty()) {
      continue;  // attributes before any newmtl are ignored
    } else if (!std::strcmp(toks[0], "Ns") && toks.size() >= 2) {
      // smoothness = sqrt(0.001 * Ns), float32 math as the reference does.
      float ns = std::strtof(toks[1], nullptr);
      mats.back().smoothness = std::sqrt(0.001f * ns);
    } else if (!std::strcmp(toks[0], "Kd") && toks.size() >= 4) {
      for (int i = 0; i < 3; ++i) {
        mats.back().albedo[i] = std::strtof(toks[1 + i], nullptr);
      }
    } else if (!std::strcmp(toks[0], "Ke") && toks.size() >= 2) {
      mats.back().emission = std::strtof(toks[1], nullptr);  // first comp only
    }
  }
  std::fclose(fh);
  return mats;
}

}  // namespace

extern "C" {

// Loads an OBJ (+MTL) into triangle-soup arrays. Returns 0 on success.
// On success, *out_* point to malloc'd arrays (sizes: verts 9T, normals 3T,
// albedo 3T, emission T, smoothness T floats) and *out_count = T.
// Nonzero return codes: 1 = cannot open obj, 2 = parse error (errbuf filled),
// 3 = unsupported face form (the reference's exit(69) case).
int rtc_load_obj(const char* path, float** out_verts, float** out_normals,
                 float** out_albedo, float** out_emission,
                 float** out_smoothness, int* out_count, char* errbuf,
                 int errlen) {
  FILE* fh = std::fopen(path, "r");
  if (!fh) {
    set_err(errbuf, errlen, std::string("cannot open ") + path);
    return 1;
  }
  std::vector<float> vx, vn;  // flat xyz triples, 0-indexed storage
  std::vector<Material> mats;
  int current_mtl = -1;
  Out out;
  std::string dir = dirname_of(path);

  char line[8192];
  long lineno = 0;
  while (std::fgets(line, sizeof line, fh)) {
    ++lineno;
    // Keep an unmodified copy for error messages before strtok mutates it.
    char raw[256];
    std::snprintf(raw, sizeof raw, "%s", line);
    auto toks = tokenize(line);
    if (toks.empty() || toks[0][0] == '#') continue;

    if (!std::strcmp(toks[0], "mtllib") && toks.size() >= 2) {
      mats = load_mtl(dir + "/" + toks[1]);
    } else if (!std::strcmp(toks[0], "usemtl") && toks.size() >= 2) {
      current_mtl = -1;
      for (size_t i = 0; i < mats.size(); ++i) {
        if (mats[i].name == toks[1]) {
          current_mtl = static_cast<int>(i);
          break;
        }
      }
    } else if (!std::strcmp(toks[0], "v") && toks.size() >= 4) {
      for (int i = 0; i < 3; ++i) vx.push_back(std::strtof(toks[1 + i], nullptr));
    } else if (!std::strcmp(toks[0], "vn") && toks.size() >= 4) {
      for (int i = 0; i < 3; ++i) vn.push_back(std::strtof(toks[1 + i], nullptr));
    } else if (!std::strcmp(toks[0], "f")) {
      if (toks.size() < 4) {
        std::fclose(fh);
        set_err(errbuf, errlen,
                std::string(path) + ":" + std::to_string(lineno) +
                    ": face with <3 vertices");
        return 2;
      }
      long vidx[3], nidx[3];
      for (int k = 0; k < 3; ++k) {  // extra vertices ignored (sscanf semantics)
        const char* g = toks[1 + k];
        // Accept exactly v/t/n; v//n is the reference's exit(69) error.
        long vi, ti, ni;
        char slash1, slash2;
        int consumed = 0;
        if (std::sscanf(g, "%ld%c%ld%c%ld%n", &vi, &slash1, &ti, &slash2, &ni,
                        &consumed) == 5 &&
            slash1 == '/' && slash2 == '/' && g[consumed] == '\0') {
          vidx[k] = vi;
          nidx[k] = ni;
        } else if (std::strstr(g, "//")) {
          std::fclose(fh);
          set_err(errbuf, errlen,
                  std::string(path) + ":" + std::to_string(lineno) +
                      ": 'f v//vn' faces are unsupported (reference exit 69)");
          return 3;
        } else {
          std::fclose(fh);
          set_err(errbuf, errlen, std::string(path) + ":" +
                                      std::to_string(lineno) +
                                      ": unparseable face: " + raw);
          return 2;
        }
      }
      long nvert = static_cast<long>(vx.size() / 3);
      long nnorm = static_cast<long>(vn.size() / 3);
      for (int k = 0; k < 3; ++k) {
        if (vidx[k] < 1 || vidx[k] > nvert || nidx[0] < 1 || nidx[0] > nnorm) {
          std::fclose(fh);
          set_err(errbuf, errlen, std::string(path) + ":" +
                                      std::to_string(lineno) +
                                      ": face index out of range");
          return 2;
        }
      }
      for (int k = 0; k < 3; ++k) {
        const float* p = &vx[(vidx[k] - 1) * 3];
        out.verts.insert(out.verts.end(), p, p + 3);
      }
      const float* n0 = &vn[(nidx[0] - 1) * 3];  // flat normal from FIRST vn
      out.normals.insert(out.normals.end(), n0, n0 + 3);
      if (current_mtl >= 0 && current_mtl < static_cast<int>(mats.size())) {
        const Material& m = mats[static_cast<size_t>(current_mtl)];
        out.albedo.insert(out.albedo.end(), m.albedo, m.albedo + 3);
        out.emission.push_back(m.emission);
        out.smoothness.push_back(m.smoothness);
      } else {
        const float def[3] = {1.0f, 1.0f, 1.0f};
        out.albedo.insert(out.albedo.end(), def, def + 3);
        out.emission.push_back(0.0f);
        out.smoothness.push_back(0.0f);
      }
    }
    // 'o', 's', 'vt', 'g', 'l' etc.: ignored, as in the reference.
  }
  std::fclose(fh);

  int t = static_cast<int>(out.emission.size());
  *out_count = t;
  auto dup = [](const std::vector<float>& v) -> float* {
    float* p = static_cast<float*>(std::malloc(v.size() * sizeof(float) + 1));
    if (!p) std::abort();  // allocation failure is unrecoverable here
    std::memcpy(p, v.data(), v.size() * sizeof(float));
    return p;
  };
  *out_verts = dup(out.verts);
  *out_normals = dup(out.normals);
  *out_albedo = dup(out.albedo);
  *out_emission = dup(out.emission);
  *out_smoothness = dup(out.smoothness);
  return 0;
}

// triangles.txt: reference cleanFile + fscanf semantics (raytracing.c:19-98).
// Returns 0 on success; 1 = cannot open, 2 = parse error.
int rtc_load_triangles_txt(const char* path, float** out_verts,
                           float** out_normals, float** out_albedo,
                           float** out_emission, float** out_smoothness,
                           int* out_count, char* errbuf, int errlen) {
  FILE* fh = std::fopen(path, "r");
  if (!fh) {
    set_err(errbuf, errlen, std::string("cannot open ") + path);
    return 1;
  }
  std::string text;
  char buf[8192];
  size_t n;
  while ((n = std::fread(buf, 1, sizeof buf, fh)) > 0) text.append(buf, n);
  std::fclose(fh);

  // Strip // line comments, then blank every char outside [0-9 - . + \n].
  std::string clean;
  clean.reserve(text.size());
  for (size_t i = 0; i < text.size(); ++i) {
    if (text[i] == '/' && i + 1 < text.size() && text[i + 1] == '/') {
      while (i < text.size() && text[i] != '\n') ++i;
      if (i < text.size()) clean.push_back('\n');
      continue;
    }
    char c = text[i];
    clean.push_back((std::isdigit(static_cast<unsigned char>(c)) || c == '-' ||
                     c == '.' || c == '+' || c == '\n')
                        ? c
                        : ' ');
  }

  std::vector<float> vals;
  const char* p = clean.c_str();
  char* end;
  for (;;) {
    while (*p && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (!*p) break;
    float v = std::strtof(p, &end);
    if (end == p) {  // lone '-'/'.'/'+' token; skip it
      ++p;
      continue;
    }
    vals.push_back(v);
    p = end;
  }
  if (vals.empty()) {
    set_err(errbuf, errlen, std::string(path) + ": no numeric tokens found");
    return 2;
  }
  int count = static_cast<int>(vals[0]);
  // Reject nonsense counts outright: a negative (or absurdly large) declared
  // count would make 14L*count wrap below and the size check pass vacuously,
  // handing Python a negative *out_count.
  if (count < 0 || static_cast<size_t>(count) > vals.size()) {
    set_err(errbuf, errlen,
            std::string(path) + ": invalid declared triangle count " +
                std::to_string(count));
    return 2;
  }
  if (static_cast<long>(vals.size()) < 1 + 14L * count) {
    set_err(errbuf, errlen,
            std::string(path) + ": declared " + std::to_string(count) +
                " triangles but only " +
                std::to_string((vals.size() - 1) / 14) + " are fully specified");
    return 2;
  }
  Out out;
  for (int t = 0; t < count; ++t) {
    const float* row = &vals[1 + 14 * t];
    out.verts.insert(out.verts.end(), row, row + 9);
    // CCW normal: normalize(cross(B - A, C - A)) (raytracing.c:24).
    float ab[3] = {row[3] - row[0], row[4] - row[1], row[5] - row[2]};
    float ac[3] = {row[6] - row[0], row[7] - row[1], row[8] - row[2]};
    float nx = ab[1] * ac[2] - ab[2] * ac[1];
    float ny = ab[2] * ac[0] - ab[0] * ac[2];
    float nz = ab[0] * ac[1] - ab[1] * ac[0];
    float len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len == 0.0f) len = 1.0f;
    out.normals.push_back(nx / len);
    out.normals.push_back(ny / len);
    out.normals.push_back(nz / len);
    out.albedo.insert(out.albedo.end(), row + 9, row + 12);
    out.emission.push_back(row[12]);
    out.smoothness.push_back(row[13]);
  }
  int t = count;
  *out_count = t;
  auto dup = [](const std::vector<float>& v) -> float* {
    float* p = static_cast<float*>(std::malloc(v.size() * sizeof(float) + 1));
    if (!p) std::abort();  // allocation failure is unrecoverable here
    std::memcpy(p, v.data(), v.size() * sizeof(float));
    return p;
  };
  *out_verts = dup(out.verts);
  *out_normals = dup(out.normals);
  *out_albedo = dup(out.albedo);
  *out_emission = dup(out.emission);
  *out_smoothness = dup(out.smoothness);
  return 0;
}

void rtc_free(float* p) { std::free(p); }

}  // extern "C"
