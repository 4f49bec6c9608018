// Fast single-pass parser for the CLIP embedding cache JSON
// (the reference pipeline's clip.json: {filename: {y/blond, place/male,
// group, split, image_embedding: [floats], y_pred}, ...}).
//
// The reference loads this with pandas.read_json (waterbirds_embeddings.py:30),
// which materializes ~200k Python dicts for CelebA; this parser streams the
// byte buffer once into contiguous arrays (one [N, D] float32 block), exposed
// over a C ABI consumed via ctypes (debiasing_multi_modal_tpu/native/ebdjson.py).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC ebdjson.cpp -o libebdjson.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <charconv>
#include <string>
#include <vector>

namespace {

struct Table {
  std::vector<std::string> filenames;
  std::vector<int32_t> y, place, group, split, y_pred;
  std::vector<float> embeddings;
  int64_t dim = -1;
  std::string error;
};

struct Cursor {
  const char* p;
  const char* end;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  }
  bool expect(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }
  char peek() {
    skip_ws();
    return p < end ? *p : '\0';
  }
};

// Hex quartet -> code unit; returns false on malformed input.
bool parse_u16(Cursor& c, uint32_t& u) {
  if (c.end - c.p < 4) return false;
  u = 0;
  for (int i = 0; i < 4; ++i) {
    char h = *c.p++;
    u <<= 4;
    if (h >= '0' && h <= '9') u |= static_cast<uint32_t>(h - '0');
    else if (h >= 'a' && h <= 'f') u |= static_cast<uint32_t>(h - 'a' + 10);
    else if (h >= 'A' && h <= 'F') u |= static_cast<uint32_t>(h - 'A' + 10);
    else return false;
  }
  return true;
}

void append_utf8(std::string& out, uint32_t cp) {
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Parse a JSON string with FULL escape handling: the reference writes
// clip.json via json.dump(ensure_ascii=True), which \uXXXX-escapes every
// non-ASCII filename byte — mishandling those silently corrupted keys.
bool parse_string(Cursor& c, std::string& out) {
  if (!c.expect('"')) return false;
  out.clear();
  while (c.p < c.end) {
    char ch = *c.p++;
    if (ch == '"') return true;
    if (ch == '\\' && c.p < c.end) {
      char esc = *c.p++;
      switch (esc) {
        case 'n': out.push_back('\n'); break;
        case 't': out.push_back('\t'); break;
        case 'r': out.push_back('\r'); break;
        case 'b': out.push_back('\b'); break;
        case 'f': out.push_back('\f'); break;
        case 'u': {
          uint32_t u;
          if (!parse_u16(c, u)) return false;
          if (u >= 0xD800 && u <= 0xDBFF) {  // high surrogate
            if (c.end - c.p < 6 || c.p[0] != '\\' || c.p[1] != 'u')
              return false;
            c.p += 2;
            uint32_t lo;
            if (!parse_u16(c, lo) || lo < 0xDC00 || lo > 0xDFFF) return false;
            u = 0x10000 + ((u - 0xD800) << 10) + (lo - 0xDC00);
          }
          append_utf8(out, u);
          break;
        }
        default: out.push_back(esc); break;
      }
    } else {
      out.push_back(ch);
    }
  }
  return false;
}

bool parse_double(Cursor& c, double& out) {
  c.skip_ws();
  auto [ptr, ec] = std::from_chars(c.p, c.end, out);
  if (ec != std::errc()) return false;
  c.p = ptr;
  return true;
}

// Labels are stored stringified ("0") by the reference writer; accept bare
// numbers too.
bool parse_label(Cursor& c, int32_t& out) {
  if (c.peek() == '"') {
    std::string s;
    if (!parse_string(c, s)) return false;
    out = static_cast<int32_t>(strtol(s.c_str(), nullptr, 10));
    return true;
  }
  double d;
  if (!parse_double(c, d)) return false;
  out = static_cast<int32_t>(d);
  return true;
}

bool parse_float_array(Cursor& c, std::vector<float>& out) {
  if (!c.expect('[')) return false;
  if (c.peek() == ']') {
    ++c.p;
    return true;
  }
  while (true) {
    double d;
    if (!parse_double(c, d)) return false;
    out.push_back(static_cast<float>(d));
    char ch = c.peek();
    if (ch == ',') {
      ++c.p;
      continue;
    }
    if (ch == ']') {
      ++c.p;
      return true;
    }
    return false;
  }
}

bool skip_value(Cursor& c);

bool skip_container(Cursor& c, char open, char close) {
  if (!c.expect(open)) return false;
  if (c.peek() == close) {
    ++c.p;
    return true;
  }
  while (true) {
    if (open == '{') {
      std::string k;
      if (!parse_string(c, k) || !c.expect(':')) return false;
    }
    if (!skip_value(c)) return false;
    char ch = c.peek();
    if (ch == ',') {
      ++c.p;
      continue;
    }
    if (ch == close) {
      ++c.p;
      return true;
    }
    return false;
  }
}

bool skip_value(Cursor& c) {
  char ch = c.peek();
  if (ch == '"') {
    std::string s;
    return parse_string(c, s);
  }
  if (ch == '{') return skip_container(c, '{', '}');
  if (ch == '[') return skip_container(c, '[', ']');
  auto lit = [&](const char* word, size_t len) {
    // bounds-checked literal match: the buffer is NOT NUL-terminated
    if (static_cast<size_t>(c.end - c.p) >= len &&
        memcmp(c.p, word, len) == 0) {
      c.p += len;
      return true;
    }
    return false;
  };
  if (lit("true", 4) || lit("false", 5) || lit("null", 4)) return true;
  double d;
  return parse_double(c, d);
}

Table* parse_impl(const char* data, size_t len, const char* ykey_c,
                  const char* pkey_c) {
  auto* t = new Table();
  const std::string ykey = ykey_c, pkey = pkey_c;
  Cursor c{data, data + len};
  if (!c.expect('{')) {
    t->error = "expected top-level object";
    return t;
  }
  if (c.peek() == '}') return t;  // empty

  std::string key, field;
  while (true) {
    if (!parse_string(c, key) || !c.expect(':') || !c.expect('{')) {
      t->error = "malformed record near byte " +
                 std::to_string(c.p - data);
      return t;
    }
    t->filenames.push_back(key);
    int32_t y = -1, place = -1, group = -1, split = -1, y_pred = -1;
    // required-field tracking: silently defaulting an absent label to -1
    // masked schema mismatches the Python loader reports as KeyError
    bool seen_y = false, seen_p = false, seen_g = false, seen_s = false,
         seen_yp = false, seen_emb = false;
    size_t emb_start = t->embeddings.size();
    if (c.peek() != '}') {
      while (true) {
        if (!parse_string(c, field) || !c.expect(':')) {
          t->error = "malformed field near byte " + std::to_string(c.p - data);
          return t;
        }
        bool ok;
        if (field == "image_embedding") {
          ok = parse_float_array(c, t->embeddings);
          seen_emb = true;
        } else if (field == ykey) {
          ok = parse_label(c, y);
          seen_y = true;
        } else if (field == pkey) {
          ok = parse_label(c, place);
          seen_p = true;
        } else if (field == "group") {
          ok = parse_label(c, group);
          seen_g = true;
        } else if (field == "split") {
          ok = parse_label(c, split);
          seen_s = true;
        } else if (field == "y_pred") {
          ok = parse_label(c, y_pred);
          seen_yp = true;
        } else {
          ok = skip_value(c);
        }
        if (!ok) {
          t->error = "bad value for field '" + field + "' near byte " +
                     std::to_string(c.p - data);
          return t;
        }
        char ch = c.peek();
        if (ch == ',') {
          ++c.p;
          continue;
        }
        if (ch == '}') {
          ++c.p;
          break;
        }
        t->error = "unexpected character in record";
        return t;
      }
    } else {
      ++c.p;
    }
    if (!(seen_y && seen_p && seen_g && seen_s && seen_yp && seen_emb)) {
      t->error = "record '" + key + "' is missing required fields (schema "
                 "mismatch? expected " + std::string(ykey) + "/" + pkey +
                 "/group/split/y_pred/image_embedding)";
      return t;
    }
    int64_t d = static_cast<int64_t>(t->embeddings.size() - emb_start);
    if (t->dim < 0) t->dim = d;
    if (d != t->dim) {
      t->error = "inconsistent embedding dim for '" + key + "'";
      return t;
    }
    t->y.push_back(y);
    t->place.push_back(place);
    t->group.push_back(group);
    t->split.push_back(split);
    t->y_pred.push_back(y_pred);

    char ch = c.peek();
    if (ch == ',') {
      ++c.p;
      continue;
    }
    if (ch == '}') break;
    t->error = "unexpected character between records";
    return t;
  }
  return t;
}

}  // namespace

extern "C" {

// Serialize the reference clip.json schema from contiguous arrays.
// filenames: concatenated NUL-separated strings. Returns 0 on success.
int ebd_write_impl(const char* path, const char* ykey, const char* pkey,
                   const char* filenames, const int32_t* y,
                   const int32_t* place, const int32_t* group,
                   const int32_t* split, const int32_t* y_pred,
                   const float* embeddings, int64_t n, int64_t dim) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  std::string out;
  out.reserve(1 << 22);
  const char* fn = filenames;
  out.push_back('{');
  char num[64];
  for (int64_t i = 0; i < n; ++i) {
    if (i) out.push_back(',');
    out.push_back('"');
    // escape like json.dump: a raw '"' or '\\' in a filename would emit
    // invalid JSON (asymmetric with the pure-Python writer)
    for (const char* s = fn; *s; ++s) {
      unsigned char uc = static_cast<unsigned char>(*s);
      if (*s == '"' || *s == '\\') {
        out.push_back('\\');
        out.push_back(*s);
      } else if (uc < 0x20) {
        int len = snprintf(num, sizeof(num), "\\u%04x", uc);
        out.append(num, len);
      } else {
        out.push_back(*s);
      }
    }
    fn += strlen(fn) + 1;
    out.append("\": {\"");
    out.append(ykey);
    out.append("\": \"");
    out.append(std::to_string(y[i]));
    out.append("\", \"group\": \"");
    out.append(std::to_string(group[i]));
    out.append("\", \"");
    out.append(pkey);
    out.append("\": \"");
    out.append(std::to_string(place[i]));
    out.append("\", \"split\": \"");
    out.append(std::to_string(split[i]));
    out.append("\", \"image_embedding\": [");
    const float* row = embeddings + i * dim;
    for (int64_t j = 0; j < dim; ++j) {
      if (j) out.push_back(',');
      int len = snprintf(num, sizeof(num), "%.9g", row[j]);
      out.append(num, len);
    }
    out.append("], \"y_pred\": \"");
    out.append(std::to_string(y_pred[i]));
    out.append("\"}");
    if (out.size() > (1 << 21)) {
      if (fwrite(out.data(), 1, out.size(), f) != out.size()) {
        fclose(f);
        return 2;
      }
      out.clear();
    }
  }
  out.push_back('}');
  int rc = fwrite(out.data(), 1, out.size(), f) == out.size() ? 0 : 2;
  // fclose flushes the FILE* buffer: an ENOSPC at flush time must not be
  // reported as success (a truncated cache written 'cleanly')
  if (fclose(f) != 0 && rc == 0) rc = 2;
  return rc;
}

void* ebd_parse_impl(const char* path, const char* ykey, const char* pkey) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    auto* t = new Table();
    t->error = std::string("cannot open ") + path;
    return t;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(len));
  size_t rd = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (rd != buf.size()) {
    auto* t = new Table();
    t->error = std::string("short read on ") + path;
    return t;
  }
  return parse_impl(buf.data(), buf.size(), ykey, pkey);
}

// C++ exceptions (bad_alloc from multi-GB buffers, length_error) must not
// unwind through the ctypes frame — that calls std::terminate and aborts
// the whole Python process; catch at the ABI boundary instead so the
// documented pure-Python fallback can engage.
int ebd_write(const char* path, const char* ykey, const char* pkey,
              const char* filenames, const int32_t* y, const int32_t* place,
              const int32_t* group, const int32_t* split,
              const int32_t* y_pred, const float* embeddings, int64_t n,
              int64_t dim) {
  try {
    return ebd_write_impl(path, ykey, pkey, filenames, y, place, group,
                          split, y_pred, embeddings, n, dim);
  } catch (...) {
    return 3;
  }
}

void* ebd_parse(const char* path, const char* ykey, const char* pkey) {
  try {
    return ebd_parse_impl(path, ykey, pkey);
  } catch (...) {
    try {
      auto* t = new Table();
      t->error = "native parser exception (out of memory?)";
      return t;
    } catch (...) {
      return nullptr;  // binding treats NULL as native-path failure
    }
  }
}

const char* ebd_error(void* h) {
  auto* t = static_cast<Table*>(h);
  return t->error.empty() ? nullptr : t->error.c_str();
}
int64_t ebd_n(void* h) { return static_cast<Table*>(h)->filenames.size(); }
int64_t ebd_dim(void* h) {
  auto* t = static_cast<Table*>(h);
  return t->dim < 0 ? 0 : t->dim;
}
const float* ebd_embeddings(void* h) {
  return static_cast<Table*>(h)->embeddings.data();
}
const int32_t* ebd_y(void* h) { return static_cast<Table*>(h)->y.data(); }
const int32_t* ebd_place(void* h) { return static_cast<Table*>(h)->place.data(); }
const int32_t* ebd_group(void* h) { return static_cast<Table*>(h)->group.data(); }
const int32_t* ebd_split(void* h) { return static_cast<Table*>(h)->split.data(); }
const int32_t* ebd_y_pred(void* h) { return static_cast<Table*>(h)->y_pred.data(); }
const char* ebd_filename(void* h, int64_t i) {
  return static_cast<Table*>(h)->filenames[static_cast<size_t>(i)].c_str();
}
void ebd_free(void* h) { delete static_cast<Table*>(h); }

}  // extern "C"
