// ckptio — asynchronous checkpoint writer (native runtime component).
//
// Role: the IO engine behind utils/checkpoint.py. The reference writes CAM
// restart files through PIO from Fortran (SURVEY §5.4); here a C++ worker
// thread drains a queue of fully-buffered checkpoint jobs so restart
// serialization overlaps the (device-side) simulation instead of stalling
// the step loop — the same pattern as histio.cpp for history tapes.
//
// Output format: uncompressed NumPy .npz (a ZIP archive, method=store, of
// .npy v1.0 members) — bit-identical semantics to np.savez and readable by
// np.load, so the Python fallback and the native path interchange freely.
//
// C API (ctypes-friendly):
//   ckptio_create()                     -> opaque handle (starts worker)
//   ckptio_write(h, path, n, names, dtypes, ndims, shapes, data)
//                                       -> enqueue (copies all buffers)
//   ckptio_flush(h)                     -> block until queue drained
//   ckptio_pending(h)                   -> jobs not yet completed
//   ckptio_destroy(h)                   -> flush + join + free

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Member {
  std::string name;          // array name (becomes name.npy in the zip)
  std::string dtype;         // numpy descr, e.g. "<f4", "<f8", "<i4"
  std::vector<int64_t> shape;
  std::vector<unsigned char> bytes;
};

struct Job {
  std::string path;
  std::vector<Member> members;
};

// CRC-32 (IEEE, reflected) — required by the ZIP local headers.
uint32_t crc32_update(uint32_t crc, const unsigned char* p, size_t n) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc = ~crc;
  for (size_t i = 0; i < n; ++i)
    crc = table[(crc ^ p[i]) & 0xff] ^ (crc >> 8);
  return ~crc;
}

void put16(std::vector<unsigned char>& b, uint16_t v) {
  b.push_back(v & 0xff);
  b.push_back((v >> 8) & 0xff);
}
void put32(std::vector<unsigned char>& b, uint32_t v) {
  for (int i = 0; i < 4; ++i) b.push_back((v >> (8 * i)) & 0xff);
}

std::vector<unsigned char> npy_bytes(const Member& m) {
  // .npy v1.0: magic, header len (padded to 64), dict, raw data
  std::string shape = "(";
  for (size_t i = 0; i < m.shape.size(); ++i) {
    shape += std::to_string(m.shape[i]);
    if (m.shape.size() == 1 || i + 1 < m.shape.size()) shape += ",";
    if (i + 1 < m.shape.size()) shape += " ";
  }
  shape += ")";
  std::string dict = "{'descr': '" + m.dtype +
      "', 'fortran_order': False, 'shape': " + shape + ", }";
  size_t hlen = 10 + dict.size() + 1;          // +1 for trailing newline
  size_t pad = (64 - hlen % 64) % 64;
  std::vector<unsigned char> out;
  out.reserve(10 + dict.size() + pad + 1 + m.bytes.size());
  const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
  out.insert(out.end(), magic, magic + 8);
  uint16_t hl = (uint16_t)(dict.size() + pad + 1);
  put16(out, hl);
  out.insert(out.end(), dict.begin(), dict.end());
  out.insert(out.end(), pad, ' ');
  out.push_back('\n');
  out.insert(out.end(), m.bytes.begin(), m.bytes.end());
  return out;
}

void write_zip(const Job& j) {
  FILE* fp = std::fopen(j.path.c_str(), "wb");
  if (!fp) return;
  struct CD {
    std::string fname;
    uint32_t crc, size, offset;
  };
  std::vector<CD> cds;
  uint32_t off = 0;
  for (const Member& m : j.members) {
    std::vector<unsigned char> payload = npy_bytes(m);
    std::string fname = m.name + ".npy";
    uint32_t crc = crc32_update(0, payload.data(), payload.size());
    std::vector<unsigned char> lh;
    put32(lh, 0x04034b50);
    put16(lh, 20);         // version needed
    put16(lh, 0);          // flags
    put16(lh, 0);          // method: store
    put16(lh, 0);          // mtime
    put16(lh, 0);          // mdate
    put32(lh, crc);
    put32(lh, (uint32_t)payload.size());
    put32(lh, (uint32_t)payload.size());
    put16(lh, (uint16_t)fname.size());
    put16(lh, 0);          // extra len
    lh.insert(lh.end(), fname.begin(), fname.end());
    std::fwrite(lh.data(), 1, lh.size(), fp);
    std::fwrite(payload.data(), 1, payload.size(), fp);
    cds.push_back({fname, crc, (uint32_t)payload.size(), off});
    off += (uint32_t)(lh.size() + payload.size());
  }
  uint32_t cd_start = off;
  uint32_t cd_size = 0;
  for (const CD& cd : cds) {
    std::vector<unsigned char> ch;
    put32(ch, 0x02014b50);
    put16(ch, 20);         // version made by
    put16(ch, 20);         // version needed
    put16(ch, 0);
    put16(ch, 0);          // method: store
    put16(ch, 0);
    put16(ch, 0);
    put32(ch, cd.crc);
    put32(ch, cd.size);
    put32(ch, cd.size);
    put16(ch, (uint16_t)cd.fname.size());
    put16(ch, 0);
    put16(ch, 0);
    put16(ch, 0);          // disk number
    put16(ch, 0);          // internal attrs
    put32(ch, 0);          // external attrs
    put32(ch, cd.offset);
    ch.insert(ch.end(), cd.fname.begin(), cd.fname.end());
    std::fwrite(ch.data(), 1, ch.size(), fp);
    cd_size += (uint32_t)ch.size();
  }
  std::vector<unsigned char> eo;
  put32(eo, 0x06054b50);
  put16(eo, 0);
  put16(eo, 0);
  put16(eo, (uint16_t)cds.size());
  put16(eo, (uint16_t)cds.size());
  put32(eo, cd_size);
  put32(eo, cd_start);
  put16(eo, 0);
  std::fwrite(eo.data(), 1, eo.size(), fp);
  std::fclose(fp);
}

struct CkptIO {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv, cv_done;
  bool stop = false;
  int inflight = 0;
  std::thread worker;

  CkptIO() {
    worker = std::thread([this] { run(); });
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (queue.empty()) {
          if (stop) return;
          continue;
        }
        job = std::move(queue.front());
        queue.pop_front();
        ++inflight;
      }
      write_zip(job);
      {
        std::lock_guard<std::mutex> lk(mu);
        --inflight;
      }
      cv_done.notify_all();
    }
  }
};

int dtype_size(const char* d) {
  // trailing digits of the numpy descr are the element size in bytes
  int n = 0;
  for (const char* p = d; *p; ++p)
    if (*p >= '0' && *p <= '9') n = n * 10 + (*p - '0');
  return n ? n : 8;
}

}  // namespace

extern "C" {

void* ckptio_create() { return new CkptIO(); }

int ckptio_write(void* handle, const char* path, int nfields,
                 const char** names, const char** dtypes, const int* ndims,
                 const int64_t* shapes, const void** data) {
  CkptIO* h = static_cast<CkptIO*>(handle);
  Job j;
  j.path = path;
  int soff = 0;
  for (int f = 0; f < nfields; ++f) {
    Member m;
    m.name = names[f];
    m.dtype = dtypes[f];
    int64_t n = 1;
    for (int d = 0; d < ndims[f]; ++d) {
      m.shape.push_back(shapes[soff + d]);
      n *= shapes[soff + d];
    }
    soff += ndims[f];
    int64_t bytes = n * dtype_size(dtypes[f]);
    const unsigned char* p = static_cast<const unsigned char*>(data[f]);
    m.bytes.assign(p, p + bytes);
    j.members.push_back(std::move(m));
  }
  {
    std::lock_guard<std::mutex> lk(h->mu);
    h->queue.push_back(std::move(j));
  }
  h->cv.notify_one();
  return 0;
}

int ckptio_pending(void* handle) {
  CkptIO* h = static_cast<CkptIO*>(handle);
  std::lock_guard<std::mutex> lk(h->mu);
  return (int)h->queue.size() + h->inflight;
}

void ckptio_flush(void* handle) {
  CkptIO* h = static_cast<CkptIO*>(handle);
  std::unique_lock<std::mutex> lk(h->mu);
  h->cv_done.wait(lk, [h] { return h->queue.empty() && h->inflight == 0; });
}

void ckptio_destroy(void* handle) {
  CkptIO* h = static_cast<CkptIO*>(handle);
  {
    std::unique_lock<std::mutex> lk(h->mu);
    h->cv_done.wait(lk, [h] { return h->queue.empty() && h->inflight == 0; });
    h->stop = true;
  }
  h->cv.notify_all();
  h->worker.join();
  delete h;
}

}  // extern "C"
