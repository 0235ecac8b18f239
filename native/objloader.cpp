// Fast OBJ geometry loader with per-shape (v,n,t)-triple de-duplication.
//
// Native replacement for the reference's host-side ingest hot spot: the
// tinyobjloader parse + std::map dedup loop in
// /root/reference/src/core/src/systems/asset_load_system.cpp:40-160, which is
// O(N log N) single-threaded and dominates load time for Sponza-class meshes
// (SURVEY.md §3.2). This implementation uses a flat open-addressing hash map
// per shape and a single-pass tokenizer; semantics match the Python reference
// implementation in capsaicin_tpu/scene/obj_loader.py exactly:
//   - one mesh per `o`/`g` group that contains faces
//   - polygon faces triangulated as fans
//   - missing normal -> (0,0,0), missing texcoord -> (0,0)
//   - per-shape first-face material name reported for texture resolution
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Mesh {
    std::string name;
    std::string material;  // first face's usemtl name ("" if none)
    std::vector<float> positions;  // flat xyz
    std::vector<float> normals;    // flat xyz
    std::vector<float> texcoords;  // flat uv
    std::vector<int32_t> indices;
};

struct MeshSet {
    std::vector<Mesh> meshes;
    std::string mtllib;  // last mtllib filename (MTL parsed in Python)
};

// Open-addressing hash map from (v,n,t) triple -> local vertex index.
class TripleMap {
  public:
    void reset(size_t expect) {
        size_t cap = 16;
        while (cap < expect * 2) cap <<= 1;
        mask_ = cap - 1;
        keys_.assign(cap * 3, INT32_MIN);
        vals_.assign(cap, -1);
        size_ = 0;
    }

    // returns existing value or -1 and remembers the insertion slot
    int32_t find_slot(int32_t v, int32_t t, int32_t n) {
        if (size_ * 2 >= vals_.size()) grow();
        uint64_t h = hash(v, t, n);
        size_t i = h & mask_;
        while (true) {
            if (vals_[i] < 0 && keys_[i * 3] == INT32_MIN) {
                slot_ = i;
                return -1;
            }
            if (keys_[i * 3] == v && keys_[i * 3 + 1] == t && keys_[i * 3 + 2] == n) {
                return vals_[i];
            }
            i = (i + 1) & mask_;
        }
    }

    void insert_at_slot(int32_t v, int32_t t, int32_t n, int32_t value) {
        keys_[slot_ * 3] = v;
        keys_[slot_ * 3 + 1] = t;
        keys_[slot_ * 3 + 2] = n;
        vals_[slot_] = value;
        size_++;
    }

  private:
    static uint64_t hash(int32_t v, int32_t t, int32_t n) {
        uint64_t h = (uint64_t)(uint32_t)v * 0x9E3779B97F4A7C15ull;
        h ^= (uint64_t)(uint32_t)t * 0xC2B2AE3D27D4EB4Full;
        h ^= (uint64_t)(uint32_t)n * 0x165667B19E3779F9ull;
        h ^= h >> 29;
        return h;
    }

    void grow() {
        std::vector<int32_t> old_keys = std::move(keys_);
        std::vector<int32_t> old_vals = std::move(vals_);
        size_t cap = (mask_ + 1) * 2;
        mask_ = cap - 1;
        keys_.assign(cap * 3, INT32_MIN);
        vals_.assign(cap, -1);
        size_ = 0;
        for (size_t i = 0; i < old_vals.size(); ++i) {
            if (old_vals[i] >= 0) {
                int32_t v = old_keys[i * 3], t = old_keys[i * 3 + 1], n = old_keys[i * 3 + 2];
                find_slot(v, t, n);
                insert_at_slot(v, t, n, old_vals[i]);
            }
        }
    }

    std::vector<int32_t> keys_;
    std::vector<int32_t> vals_;
    size_t mask_ = 0;
    size_t size_ = 0;
    size_t slot_ = 0;
};

inline const char* skip_ws(const char* p) {
    while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
    return p;
}

inline int32_t resolve(long raw, size_t count) {
    return raw > 0 ? (int32_t)(raw - 1) : (int32_t)((long)count + raw);
}

struct Corner {
    int32_t v, t, n;
};

}  // namespace

extern "C" {

void* caps_load_obj(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string buf;
    buf.resize(len);
    if (len > 0 && fread(&buf[0], 1, len, f) != (size_t)len) {
        fclose(f);
        return nullptr;
    }
    fclose(f);

    auto* set = new MeshSet();
    std::vector<float> vx;  // flat positions
    std::vector<float> nx;  // flat normals
    std::vector<float> tx;  // flat texcoords

    Mesh cur;
    TripleMap cache;
    cache.reset(1024);
    std::string cur_mtl;
    bool cur_has_faces = false;

    auto close_shape = [&]() {
        if (cur_has_faces) {
            set->meshes.push_back(std::move(cur));
        }
        cur = Mesh();
        cache.reset(1024);
        cur_has_faces = false;
    };

    std::vector<Corner> corners;
    const char* p = buf.c_str();
    const char* end = p + buf.size();
    while (p < end) {
        const char* nl = (const char*)memchr(p, '\n', end - p);
        const char* line_end = nl ? nl : end;
        const char* q = skip_ws(p);

        if (q[0] == 'v' && q[1] == ' ') {
            char* e;
            float a = strtof(q + 2, &e), b = strtof(e, &e), c = strtof(e, &e);
            vx.push_back(a); vx.push_back(b); vx.push_back(c);
        } else if (q[0] == 'v' && q[1] == 'n' && q[2] == ' ') {
            char* e;
            float a = strtof(q + 3, &e), b = strtof(e, &e), c = strtof(e, &e);
            nx.push_back(a); nx.push_back(b); nx.push_back(c);
        } else if (q[0] == 'v' && q[1] == 't' && q[2] == ' ') {
            char* e;
            float a = strtof(q + 3, &e), b = strtof(e, &e);
            tx.push_back(a); tx.push_back(b);
        } else if ((q[0] == 'o' || q[0] == 'g') && (q[1] == ' ' || q[1] == '\r' || q == line_end - 1)) {
            close_shape();
            const char* name = skip_ws(q + 1);
            cur.name.assign(name, line_end - name);
            while (!cur.name.empty() && (cur.name.back() == '\r' || cur.name.back() == ' '))
                cur.name.pop_back();
        } else if (!strncmp(q, "usemtl", 6)) {
            const char* name = skip_ws(q + 6);
            cur_mtl.assign(name, line_end - name);
            while (!cur_mtl.empty() && (cur_mtl.back() == '\r' || cur_mtl.back() == ' '))
                cur_mtl.pop_back();
        } else if (!strncmp(q, "mtllib", 6)) {
            const char* name = skip_ws(q + 6);
            set->mtllib.assign(name, line_end - name);
            while (!set->mtllib.empty() &&
                   (set->mtllib.back() == '\r' || set->mtllib.back() == ' '))
                set->mtllib.pop_back();
        } else if (q[0] == 'f' && q[1] == ' ') {
            corners.clear();
            const char* s = q + 2;
            while (s < line_end) {
                s = skip_ws(s);
                if (s >= line_end || *s == '\n') break;
                char* e;
                long vi = strtol(s, &e, 10);
                if (e == s) break;
                long ti = 0, ni = 0;
                bool has_t = false, has_n = false;
                if (*e == '/') {
                    ++e;
                    if (*e != '/') {
                        ti = strtol(e, &e, 10);
                        has_t = true;
                    }
                    if (*e == '/') {
                        ++e;
                        ni = strtol(e, &e, 10);
                        has_n = true;
                    }
                }
                Corner c;
                c.v = resolve(vi, vx.size() / 3);
                c.t = has_t ? resolve(ti, tx.size() / 2) : -1;
                c.n = has_n ? resolve(ni, nx.size() / 3) : -1;
                corners.push_back(c);
                s = e;
            }
            if (corners.size() >= 3) {
                if (!cur_has_faces) {
                    cur.material = cur_mtl;
                    cur_has_faces = true;
                }
                auto add_corner = [&](const Corner& c) {
                    int32_t existing = cache.find_slot(c.v, c.t, c.n);
                    if (existing >= 0) {
                        cur.indices.push_back(existing);
                        return;
                    }
                    int32_t idx = (int32_t)(cur.positions.size() / 3);
                    cache.insert_at_slot(c.v, c.t, c.n, idx);
                    cur.indices.push_back(idx);
                    cur.positions.push_back(vx[c.v * 3]);
                    cur.positions.push_back(vx[c.v * 3 + 1]);
                    cur.positions.push_back(vx[c.v * 3 + 2]);
                    if (c.n >= 0) {
                        cur.normals.push_back(nx[c.n * 3]);
                        cur.normals.push_back(nx[c.n * 3 + 1]);
                        cur.normals.push_back(nx[c.n * 3 + 2]);
                    } else {
                        cur.normals.push_back(0.f);
                        cur.normals.push_back(0.f);
                        cur.normals.push_back(0.f);
                    }
                    if (c.t >= 0) {
                        cur.texcoords.push_back(tx[c.t * 2]);
                        cur.texcoords.push_back(tx[c.t * 2 + 1]);
                    } else {
                        cur.texcoords.push_back(0.f);
                        cur.texcoords.push_back(0.f);
                    }
                };
                for (size_t k = 1; k + 1 < corners.size(); ++k) {
                    add_corner(corners[0]);
                    add_corner(corners[k]);
                    add_corner(corners[k + 1]);
                }
            }
        }
        p = nl ? nl + 1 : end;
    }
    close_shape();
    return set;
}

void caps_free(void* h) { delete (MeshSet*)h; }

int32_t caps_num_meshes(void* h) { return (int32_t)((MeshSet*)h)->meshes.size(); }

const char* caps_mtllib(void* h) { return ((MeshSet*)h)->mtllib.c_str(); }

const char* caps_mesh_name(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].name.c_str();
}

const char* caps_mesh_material(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].material.c_str();
}

int32_t caps_mesh_vertex_count(void* h, int32_t i) {
    return (int32_t)(((MeshSet*)h)->meshes[i].positions.size() / 3);
}

int32_t caps_mesh_index_count(void* h, int32_t i) {
    return (int32_t)(((MeshSet*)h)->meshes[i].indices.size());
}

const float* caps_mesh_positions(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].positions.data();
}

const float* caps_mesh_normals(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].normals.data();
}

const float* caps_mesh_texcoords(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].texcoords.data();
}

const int32_t* caps_mesh_indices(void* h, int32_t i) {
    return ((MeshSet*)h)->meshes[i].indices.data();
}

}  // extern "C"
