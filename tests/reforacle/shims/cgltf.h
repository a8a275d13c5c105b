// Minimal cgltf-compatible shim — implements exactly the subset of the cgltf
// API consumed by the reference glTF loader (model.h:301-460) so the
// read-only reference checkout can be compiled as a parity-test oracle
// without its cgltf submodule.  From-scratch: a tiny JSON parser + struct
// mapping, header-only.
//
// Faithfulness notes: the reference reads vertex data at bufferView->offset
// (ignoring accessor->offset/stride, model.h:343,359,448), so this shim only
// needs buffer views and raw buffer bytes to be exact.  External .bin URIs
// are resolved relative to the .gltf path, like cgltf_load_buffers.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

// ---- public API types (names/fields match cgltf where used) ---------------

typedef enum cgltf_result {
  cgltf_result_success = 0,
  cgltf_result_io_error = 1,
  cgltf_result_invalid_json = 2,
} cgltf_result;

typedef enum cgltf_file_type {
  cgltf_file_type_invalid = 0,
  cgltf_file_type_gltf = 1,
  cgltf_file_type_glb = 2,
} cgltf_file_type;

typedef struct cgltf_options {
  cgltf_file_type type;
} cgltf_options;

typedef enum cgltf_attribute_type {
  cgltf_attribute_type_invalid = 0,
  cgltf_attribute_type_position,
  cgltf_attribute_type_normal,
  cgltf_attribute_type_tangent,
  cgltf_attribute_type_texcoord,
  cgltf_attribute_type_color,
} cgltf_attribute_type;

typedef enum cgltf_type {
  cgltf_type_invalid = 0,
  cgltf_type_scalar,
  cgltf_type_vec2,
  cgltf_type_vec3,
  cgltf_type_vec4,
} cgltf_type;

typedef enum cgltf_primitive_type {
  cgltf_primitive_type_points = 0,
  cgltf_primitive_type_lines = 1,
  cgltf_primitive_type_triangles = 4,
} cgltf_primitive_type;

typedef struct cgltf_buffer {
  size_t size;
  char* uri;
  void* data;
} cgltf_buffer;

typedef struct cgltf_buffer_view {
  cgltf_buffer* buffer;
  size_t offset;
  size_t size;
} cgltf_buffer_view;

typedef struct cgltf_accessor {
  cgltf_buffer_view* buffer_view;
  size_t offset;
  size_t count;
  cgltf_type type;
  int component_type;
} cgltf_accessor;

typedef struct cgltf_image {
  char* uri;
} cgltf_image;

typedef struct cgltf_texture {
  cgltf_image* image;
} cgltf_texture;

typedef struct cgltf_texture_view {
  cgltf_texture* texture;
} cgltf_texture_view;

typedef struct cgltf_pbr_metallic_roughness {
  cgltf_texture_view base_color_texture;
  cgltf_texture_view metallic_roughness_texture;
  float base_color_factor[4];
  float metallic_factor;
  float roughness_factor;
} cgltf_pbr_metallic_roughness;

typedef struct cgltf_material {
  int has_pbr_metallic_roughness;
  cgltf_pbr_metallic_roughness pbr_metallic_roughness;
  cgltf_texture_view normal_texture;
} cgltf_material;

typedef struct cgltf_attribute {
  cgltf_attribute_type type;
  cgltf_accessor* data;
} cgltf_attribute;

typedef struct cgltf_primitive {
  cgltf_primitive_type type;
  cgltf_accessor* indices;
  cgltf_material* material;
  cgltf_attribute* attributes;
  size_t attributes_count;
} cgltf_primitive;

typedef struct cgltf_mesh {
  cgltf_primitive* primitives;
  size_t primitives_count;
} cgltf_mesh;

typedef struct cgltf_data {
  cgltf_mesh* meshes;
  size_t meshes_count;
  cgltf_accessor* accessors;
  size_t accessors_count;
  cgltf_buffer_view* buffer_views;
  size_t buffer_views_count;
  cgltf_buffer* buffers;
  size_t buffers_count;
  cgltf_material* materials;
  size_t materials_count;
  cgltf_texture* textures;
  size_t textures_count;
  cgltf_image* images;
  size_t images_count;
  // shim bookkeeping
  std::vector<std::string>* strings;
} cgltf_data;

// ---- tiny JSON parser ------------------------------------------------------

namespace cgltf_shim {

struct JValue {
  enum Kind { Null, Bool, Num, Str, Arr, Obj } kind = Null;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<JValue> arr;
  std::map<std::string, JValue> obj;

  bool has(const std::string& k) const {
    return kind == Obj && obj.count(k) > 0;
  }
  const JValue& operator[](const std::string& k) const {
    static JValue null_value;
    auto it = obj.find(k);
    return it == obj.end() ? null_value : it->second;
  }
  double numOr(double d) const { return kind == Num ? num : d; }
};

struct JParser {
  const char* p;
  const char* end;
  bool ok = true;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool lit(const char* s) {
    size_t n = std::strlen(s);
    if (size_t(end - p) >= n && std::strncmp(p, s, n) == 0) {
      p += n;
      return true;
    }
    ok = false;
    return false;
  }
  JValue parse() {
    ws();
    JValue v;
    if (p >= end) {
      ok = false;
      return v;
    }
    switch (*p) {
      case '{': {
        v.kind = JValue::Obj;
        ++p;
        ws();
        if (p < end && *p == '}') {
          ++p;
          return v;
        }
        while (ok) {
          ws();
          JValue key = parse();  // string
          ws();
          if (p >= end || *p != ':') {
            ok = false;
            break;
          }
          ++p;
          v.obj[key.str] = parse();
          ws();
          if (p < end && *p == ',') {
            ++p;
            continue;
          }
          if (p < end && *p == '}') {
            ++p;
            break;
          }
          ok = false;
          break;
        }
        return v;
      }
      case '[': {
        v.kind = JValue::Arr;
        ++p;
        ws();
        if (p < end && *p == ']') {
          ++p;
          return v;
        }
        while (ok) {
          v.arr.push_back(parse());
          ws();
          if (p < end && *p == ',') {
            ++p;
            continue;
          }
          if (p < end && *p == ']') {
            ++p;
            break;
          }
          ok = false;
          break;
        }
        return v;
      }
      case '"': {
        v.kind = JValue::Str;
        ++p;
        while (p < end && *p != '"') {
          if (*p == '\\' && p + 1 < end) {
            ++p;
            switch (*p) {
              case 'n': v.str += '\n'; break;
              case 't': v.str += '\t'; break;
              case 'r': v.str += '\r'; break;
              case 'b': v.str += '\b'; break;
              case 'f': v.str += '\f'; break;
              case 'u': {  // \uXXXX -> raw byte (ASCII subset is enough here)
                if (end - p >= 5) {
                  char hex[5] = {p[1], p[2], p[3], p[4], 0};
                  v.str += static_cast<char>(std::strtol(hex, nullptr, 16));
                  p += 4;
                }
                break;
              }
              default: v.str += *p;
            }
          } else {
            v.str += *p;
          }
          ++p;
        }
        if (p < end) ++p;  // closing quote
        return v;
      }
      case 't':
        v.kind = JValue::Bool;
        v.b = true;
        lit("true");
        return v;
      case 'f':
        v.kind = JValue::Bool;
        v.b = false;
        lit("false");
        return v;
      case 'n':
        lit("null");
        return v;
      default: {
        v.kind = JValue::Num;
        char* e2 = nullptr;
        v.num = std::strtod(p, &e2);
        if (e2 == p) {
          ok = false;
        } else {
          p = e2;
        }
        return v;
      }
    }
  }
};

inline std::string dirOf(const std::string& path) {
  size_t k = path.find_last_of("/\\");
  return k == std::string::npos ? std::string(".") : path.substr(0, k);
}

inline bool readFile(const std::string& path, std::vector<char>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(n > 0 ? size_t(n) : 0);
  size_t rd = n > 0 ? std::fread(out.data(), 1, size_t(n), f) : 0;
  std::fclose(f);
  return rd == out.size();
}

}  // namespace cgltf_shim

// ---- API -------------------------------------------------------------------

static inline cgltf_result cgltf_parse_file(const cgltf_options*,
                                            const char* path,
                                            cgltf_data** out) {
  using namespace cgltf_shim;
  std::vector<char> bytes;
  if (!readFile(path, bytes)) return cgltf_result_io_error;

  JParser jp{bytes.data(), bytes.data() + bytes.size()};
  JValue root = jp.parse();
  if (!jp.ok || root.kind != JValue::Obj) return cgltf_result_invalid_json;

  cgltf_data* d = new cgltf_data();
  std::memset(static_cast<void*>(d), 0, sizeof(cgltf_data));
  d->strings = new std::vector<std::string>();
  auto intern = [&](const std::string& s) -> char* {
    d->strings->push_back(s);
    return const_cast<char*>(d->strings->back().c_str());
  };

  const JValue& jbufs = root["buffers"];
  d->buffers_count = jbufs.arr.size();
  d->buffers = new cgltf_buffer[d->buffers_count ? d->buffers_count : 1]();
  for (size_t i = 0; i < d->buffers_count; ++i) {
    d->buffers[i].size = size_t(jbufs.arr[i]["byteLength"].numOr(0));
    d->buffers[i].uri =
        jbufs.arr[i].has("uri") ? intern(jbufs.arr[i]["uri"].str) : nullptr;
    d->buffers[i].data = nullptr;
  }

  const JValue& jviews = root["bufferViews"];
  d->buffer_views_count = jviews.arr.size();
  d->buffer_views =
      new cgltf_buffer_view[d->buffer_views_count ? d->buffer_views_count : 1]();
  for (size_t i = 0; i < d->buffer_views_count; ++i) {
    const JValue& v = jviews.arr[i];
    d->buffer_views[i].buffer = &d->buffers[size_t(v["buffer"].numOr(0))];
    d->buffer_views[i].offset = size_t(v["byteOffset"].numOr(0));
    d->buffer_views[i].size = size_t(v["byteLength"].numOr(0));
  }

  const JValue& jacc = root["accessors"];
  d->accessors_count = jacc.arr.size();
  d->accessors = new cgltf_accessor[d->accessors_count ? d->accessors_count : 1]();
  for (size_t i = 0; i < d->accessors_count; ++i) {
    const JValue& a = jacc.arr[i];
    d->accessors[i].buffer_view =
        a.has("bufferView") ? &d->buffer_views[size_t(a["bufferView"].num)]
                            : nullptr;
    d->accessors[i].offset = size_t(a["byteOffset"].numOr(0));
    d->accessors[i].count = size_t(a["count"].numOr(0));
    d->accessors[i].component_type = int(a["componentType"].numOr(0));
    const std::string& t = a["type"].str;
    d->accessors[i].type = t == "SCALAR"  ? cgltf_type_scalar
                           : t == "VEC2" ? cgltf_type_vec2
                           : t == "VEC3" ? cgltf_type_vec3
                           : t == "VEC4" ? cgltf_type_vec4
                                         : cgltf_type_invalid;
  }

  const JValue& jimgs = root["images"];
  d->images_count = jimgs.arr.size();
  d->images = new cgltf_image[d->images_count ? d->images_count : 1]();
  for (size_t i = 0; i < d->images_count; ++i)
    d->images[i].uri =
        jimgs.arr[i].has("uri") ? intern(jimgs.arr[i]["uri"].str) : nullptr;

  const JValue& jtex = root["textures"];
  d->textures_count = jtex.arr.size();
  d->textures = new cgltf_texture[d->textures_count ? d->textures_count : 1]();
  for (size_t i = 0; i < d->textures_count; ++i) {
    d->textures[i].image = jtex.arr[i].has("source")
                               ? &d->images[size_t(jtex.arr[i]["source"].num)]
                               : nullptr;
  }

  const JValue& jmats = root["materials"];
  d->materials_count = jmats.arr.size();
  d->materials = new cgltf_material[d->materials_count ? d->materials_count : 1]();
  for (size_t i = 0; i < d->materials_count; ++i) {
    const JValue& m = jmats.arr[i];
    cgltf_material& out_m = d->materials[i];
    // baseColorFactor defaults to (1,1,1,1); metallic/roughness factors
    // default to 0 — NOT the glTF 2.0 spec's 1.0 — matching the
    // reference's vendored-cgltf-era behavior that its golden images
    // embody (VALIDATION.md §4: with roughness=1 the chief renders
    // +8..12/255 brighter/bluer than both goldens; with 0 it matches).
    // The framework's own loader uses the same 0 default.
    out_m.has_pbr_metallic_roughness = m.has("pbrMetallicRoughness") ? 1 : 0;
    for (int k = 0; k < 4; ++k)
      out_m.pbr_metallic_roughness.base_color_factor[k] = 1.0f;
    out_m.pbr_metallic_roughness.metallic_factor = 0.0f;
    out_m.pbr_metallic_roughness.roughness_factor = 0.0f;
    if (out_m.has_pbr_metallic_roughness) {
      const JValue& pbr = m["pbrMetallicRoughness"];
      if (pbr.has("baseColorFactor"))
        for (size_t k = 0; k < 4 && k < pbr["baseColorFactor"].arr.size(); ++k)
          out_m.pbr_metallic_roughness.base_color_factor[k] =
              float(pbr["baseColorFactor"].arr[k].num);
      if (pbr.has("metallicFactor"))
        out_m.pbr_metallic_roughness.metallic_factor =
            float(pbr["metallicFactor"].num);
      if (pbr.has("roughnessFactor"))
        out_m.pbr_metallic_roughness.roughness_factor =
            float(pbr["roughnessFactor"].num);
      if (pbr.has("baseColorTexture"))
        out_m.pbr_metallic_roughness.base_color_texture.texture =
            &d->textures[size_t(pbr["baseColorTexture"]["index"].num)];
      if (pbr.has("metallicRoughnessTexture"))
        out_m.pbr_metallic_roughness.metallic_roughness_texture.texture =
            &d->textures[size_t(pbr["metallicRoughnessTexture"]["index"].num)];
    }
    if (m.has("normalTexture"))
      out_m.normal_texture.texture =
          &d->textures[size_t(m["normalTexture"]["index"].num)];
  }

  const JValue& jmeshes = root["meshes"];
  d->meshes_count = jmeshes.arr.size();
  d->meshes = new cgltf_mesh[d->meshes_count ? d->meshes_count : 1]();
  for (size_t i = 0; i < d->meshes_count; ++i) {
    const JValue& jm = jmeshes.arr[i];
    const JValue& jprims = jm["primitives"];
    d->meshes[i].primitives_count = jprims.arr.size();
    d->meshes[i].primitives =
        new cgltf_primitive[jprims.arr.size() ? jprims.arr.size() : 1]();
    for (size_t j = 0; j < jprims.arr.size(); ++j) {
      const JValue& jp2 = jprims.arr[j];
      cgltf_primitive& prim = d->meshes[i].primitives[j];
      prim.type =
          cgltf_primitive_type(int(jp2["mode"].numOr(4)));  // default triangles
      prim.indices = jp2.has("indices")
                         ? &d->accessors[size_t(jp2["indices"].num)]
                         : nullptr;
      prim.material = jp2.has("material")
                          ? &d->materials[size_t(jp2["material"].num)]
                          : nullptr;
      const JValue& jattrs = jp2["attributes"];
      prim.attributes_count = jattrs.obj.size();
      prim.attributes =
          new cgltf_attribute[prim.attributes_count ? prim.attributes_count : 1]();
      size_t k = 0;
      for (const auto& kv : jattrs.obj) {
        cgltf_attribute& at = prim.attributes[k++];
        const std::string& name = kv.first;
        at.type = name == "POSITION" ? cgltf_attribute_type_position
                  : name.rfind("TEXCOORD", 0) == 0
                      ? cgltf_attribute_type_texcoord
                  : name == "NORMAL"  ? cgltf_attribute_type_normal
                  : name == "TANGENT" ? cgltf_attribute_type_tangent
                                      : cgltf_attribute_type_invalid;
        at.data = &d->accessors[size_t(kv.second.num)];
      }
    }
  }

  *out = d;
  return cgltf_result_success;
}

static inline cgltf_result cgltf_load_buffers(const cgltf_options*,
                                              cgltf_data* d,
                                              const char* gltf_path) {
  using namespace cgltf_shim;
  std::string dir = dirOf(gltf_path);
  for (size_t i = 0; i < d->buffers_count; ++i) {
    if (!d->buffers[i].uri) continue;  // GLB-embedded: unsupported in shim
    std::string uri = d->buffers[i].uri;
    if (uri.rfind("data:", 0) == 0) return cgltf_result_io_error;
    std::vector<char>* bytes = new std::vector<char>();
    if (!readFile(dir + "/" + uri, *bytes)) {
      delete bytes;
      return cgltf_result_io_error;
    }
    d->buffers[i].data = bytes->data();
    d->buffers[i].size = bytes->size();
    // intentionally leaked until cgltf_free (oracle binary is short-lived)
  }
  return cgltf_result_success;
}

static inline void cgltf_free(cgltf_data* d) {
  // Oracle binary exits right after rendering; precise cleanup is skipped
  // deliberately (buffers alias into vectors referenced by loaded meshes).
  (void)d;
}
