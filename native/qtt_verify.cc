// qtt-verify: native comparator for verification tensor dumps.
//
// The reference framework's native layer is the protobuf C++ that carries its
// compiled program + per-tensor .bin dumps to an external simulator/RTL
// testbench (reference: codegen/param.pb.cc, compile_protos.sh,
// mapping_utils.py:19-61).  This framework's interchange artifact is the
// manifest + raw .bin dump directory written by
// quantized_training_tpu.compile.dump_verification_tensors; qtt-verify is
// the native consumer: it loads two dump directories (e.g. TPU run vs
// reference run, or chip vs simulator) and compares every tensor with
// configurable absolute/relative tolerance, reporting per-tensor max error
// and a pass/fail summary.
//
// Build:  make -C native        (or: g++ -O2 -std=c++17 -o qtt-verify qtt_verify.cc)
// Usage:  qtt-verify DIR_A DIR_B [--rtol 1e-3] [--atol 1e-5]
//
// Manifest format (manifest.txt, one tensor per line):
//   <name> <file> <dtype> <ndim> <dim0> <dim1> ...

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct TensorMeta {
  std::string name;
  std::string file;
  std::string dtype;
  std::vector<int64_t> shape;

  int64_t numel() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
};

bool ReadManifest(const std::string& dir, std::map<std::string, TensorMeta>* out) {
  std::ifstream f(dir + "/manifest.txt");
  if (!f) {
    std::fprintf(stderr, "error: cannot open %s/manifest.txt\n", dir.c_str());
    return false;
  }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    TensorMeta m;
    int ndim = 0;
    if (!(ss >> m.name >> m.file >> m.dtype >> ndim)) continue;
    m.shape.resize(ndim);
    for (int i = 0; i < ndim; ++i) ss >> m.shape[i];
    (*out)[m.name] = m;
  }
  return true;
}

size_t DtypeSize(const std::string& dtype) {
  if (dtype == "float32" || dtype == "int32" || dtype == "uint32") return 4;
  if (dtype == "float64" || dtype == "int64") return 8;
  if (dtype == "float16" || dtype == "bfloat16" || dtype == "int16") return 2;
  if (dtype == "int8" || dtype == "uint8") return 1;
  return 0;
}

bool ReadBin(const std::string& path, size_t bytes, std::vector<char>* buf) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  buf->resize(bytes);
  f.read(buf->data(), static_cast<std::streamsize>(bytes));
  return static_cast<size_t>(f.gcount()) == bytes;
}

// Decode one element at index i to double for comparison.
double ElementAt(const std::vector<char>& buf, const std::string& dtype,
                 int64_t i) {
  const char* p = buf.data();
  if (dtype == "float32") return reinterpret_cast<const float*>(p)[i];
  if (dtype == "float64") return reinterpret_cast<const double*>(p)[i];
  if (dtype == "int32") return reinterpret_cast<const int32_t*>(p)[i];
  if (dtype == "int64") return static_cast<double>(reinterpret_cast<const int64_t*>(p)[i]);
  if (dtype == "uint32") return reinterpret_cast<const uint32_t*>(p)[i];
  if (dtype == "int16") return reinterpret_cast<const int16_t*>(p)[i];
  if (dtype == "int8") return reinterpret_cast<const int8_t*>(p)[i];
  if (dtype == "uint8") return reinterpret_cast<const uint8_t*>(p)[i];
  if (dtype == "bfloat16") {
    uint16_t b = reinterpret_cast<const uint16_t*>(p)[i];
    uint32_t w = static_cast<uint32_t>(b) << 16;
    float out;
    std::memcpy(&out, &w, sizeof(out));
    return out;
  }
  if (dtype == "float16") {
    // minimal fp16 decode
    uint16_t h = reinterpret_cast<const uint16_t*>(p)[i];
    uint32_t sign = (h >> 15) & 1, exp = (h >> 10) & 0x1F, frac = h & 0x3FF;
    double v;
    if (exp == 0) v = std::ldexp(static_cast<double>(frac), -24);
    else if (exp == 31) v = frac ? NAN : INFINITY;
    else v = std::ldexp(1.0 + frac / 1024.0, static_cast<int>(exp) - 15);
    return sign ? -v : v;
  }
  return NAN;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s DIR_A DIR_B [--rtol R] [--atol A]\n",
                 argv[0]);
    return 2;
  }
  std::string dir_a = argv[1], dir_b = argv[2];
  double rtol = 1e-3, atol = 1e-5;
  for (int i = 3; i + 1 < argc; i += 2) {
    if (!std::strcmp(argv[i], "--rtol")) rtol = std::atof(argv[i + 1]);
    if (!std::strcmp(argv[i], "--atol")) atol = std::atof(argv[i + 1]);
  }

  std::map<std::string, TensorMeta> ma, mb;
  if (!ReadManifest(dir_a, &ma) || !ReadManifest(dir_b, &mb)) return 2;

  int failures = 0, compared = 0, missing = 0;
  for (const auto& [name, a] : ma) {
    auto it = mb.find(name);
    if (it == mb.end()) {
      std::printf("MISSING  %-32s only in %s\n", name.c_str(), dir_a.c_str());
      ++missing;
      continue;
    }
    const TensorMeta& b = it->second;
    if (a.shape != b.shape) {
      std::printf("SHAPE    %-32s mismatch\n", name.c_str());
      ++failures;
      continue;
    }
    size_t esz_a = DtypeSize(a.dtype), esz_b = DtypeSize(b.dtype);
    if (!esz_a || !esz_b) {
      std::printf("DTYPE    %-32s unsupported (%s vs %s)\n", name.c_str(),
                  a.dtype.c_str(), b.dtype.c_str());
      ++failures;
      continue;
    }
    std::vector<char> buf_a, buf_b;
    if (!ReadBin(dir_a + "/" + a.file, a.numel() * esz_a, &buf_a) ||
        !ReadBin(dir_b + "/" + b.file, b.numel() * esz_b, &buf_b)) {
      std::printf("IOERROR  %-32s\n", name.c_str());
      ++failures;
      continue;
    }
    double max_abs = 0.0, max_rel = 0.0;
    int64_t bad = 0, n = a.numel();
    for (int64_t i = 0; i < n; ++i) {
      double va = ElementAt(buf_a, a.dtype, i);
      double vb = ElementAt(buf_b, b.dtype, i);
      if (std::isnan(va) && std::isnan(vb)) continue;
      double diff = std::fabs(va - vb);
      double rel = diff / (std::fabs(vb) + 1e-30);
      if (diff > max_abs) max_abs = diff;
      if (rel > max_rel) max_rel = rel;
      if (diff > atol + rtol * std::fabs(vb)) ++bad;
    }
    ++compared;
    if (bad > 0) {
      ++failures;
      std::printf("FAIL     %-32s %lld/%lld elems out of tol "
                  "(max_abs=%.3e max_rel=%.3e)\n",
                  name.c_str(), static_cast<long long>(bad),
                  static_cast<long long>(n), max_abs, max_rel);
    } else {
      std::printf("OK       %-32s max_abs=%.3e max_rel=%.3e\n", name.c_str(),
                  max_abs, max_rel);
    }
  }
  for (const auto& [name, b] : mb) {
    if (!ma.count(name)) {
      std::printf("MISSING  %-32s only in %s\n", name.c_str(), dir_b.c_str());
      ++missing;
    }
  }
  std::printf("summary: %d compared, %d failed, %d missing\n", compared,
              failures, missing);
  return failures ? 1 : 0;
}
