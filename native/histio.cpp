// histio — asynchronous history-tape writer (native runtime component).
//
// Role: the IO engine behind the cam_history-equivalent
// (cam_nor_physics_tpu/utils/history.py). The reference's history writes go
// through PIO from Fortran (SURVEY §5.5); here a C++ worker thread drains a
// queue of fully-buffered tape-write jobs so NetCDF serialization overlaps
// the (device-side) simulation instead of stalling the step loop.
//
// Output format: NetCDF-3 classic (CDF-1), written directly — dimensions
// lat/lon/slat/slon/lev/ilev/time(=1), float32 fields (time, [lev|ilev,]
// lat, lon) plus FV staggered-grid fields ((time, lev, slat, lon) /
// (time, lev, lat, slon)), double coordinates. Readable by
// scipy.io.netcdf_file and CAM tooling.
//
// C API (ctypes-friendly):
//   histio_create()                      -> opaque handle (starts worker)
//   histio_write_tape(h, path, ...)      -> enqueue (copies all buffers)
//   histio_flush(h)                      -> block until queue drained
//   histio_destroy(h)                    -> flush + join + free
//   histio_pending(h)                    -> jobs not yet completed

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

// ---------------- NetCDF-3 classic encoding helpers ----------------

struct Buf {
  std::vector<unsigned char> b;
  void u8(unsigned char v) { b.push_back(v); }
  void i32(int32_t v) {
    b.push_back((v >> 24) & 0xff);
    b.push_back((v >> 16) & 0xff);
    b.push_back((v >> 8) & 0xff);
    b.push_back(v & 0xff);
  }
  void f32(float v) {
    uint32_t u;
    std::memcpy(&u, &v, 4);
    i32((int32_t)u);
  }
  void f64(double v) {
    uint64_t u;
    std::memcpy(&u, &v, 8);
    i32((int32_t)(u >> 32));
    i32((int32_t)(u & 0xffffffffu));
  }
  void name(const std::string& s) {
    i32((int32_t)s.size());
    for (char c : s) u8((unsigned char)c);
    while (b.size() % 4) u8(0);
  }
  size_t size() const { return b.size(); }
};

constexpr int32_t NC_DIMENSION = 0x0A;
constexpr int32_t NC_VARIABLE = 0x0B;
constexpr int32_t NC_ATTRIBUTE = 0x0C;
constexpr int32_t NC_CHAR = 2;
constexpr int32_t NC_FLOAT = 5;
constexpr int32_t NC_DOUBLE = 6;

struct VarDef {
  std::string name;
  std::vector<int> dimids;
  int nc_type;                      // NC_FLOAT or NC_DOUBLE
  std::vector<std::pair<std::string, std::string>> atts;  // text attributes
  const std::vector<float>* fdata = nullptr;
  const std::vector<double>* ddata = nullptr;
};

struct Job {
  std::string path;
  int jm, im, nlev;
  std::vector<double> lats, lons;
  double time_days;
  std::vector<std::string> names, units;
  std::vector<int> vdims;           // 0=srf, 1=mid, 2=int, 3=us, 4=vs
  std::vector<std::vector<float>> data;
};

void write_tape(const Job& j) {
  // dims: 0=time(1) 1=lat 2=lon 3=lev 4=ilev 5=slat(jm-1) 6=slon(im)
  const int32_t dimsizes[7] = {1, j.jm, j.im, j.nlev, j.nlev + 1,
                               j.jm - 1, j.im};
  const char* dimnames[7] = {"time", "lat", "lon", "lev", "ilev",
                             "slat", "slon"};

  std::vector<double> timev{j.time_days};
  // FV staggered coordinates: slat = interface latitudes (midpoints of the
  // uniform center latitudes), slon = west-edge longitudes (lon - dl/2)
  std::vector<double> slats(j.jm - 1), slons(j.im);
  for (int r = 0; r < j.jm - 1; ++r)
    slats[r] = 0.5 * (j.lats[r] + j.lats[r + 1]);
  const double dl = j.im > 1 ? j.lons[1] - j.lons[0] : 0.0;
  for (int i = 0; i < j.im; ++i) slons[i] = j.lons[i] - 0.5 * dl;
  std::vector<VarDef> vars;
  {
    VarDef v;
    v.name = "time";
    v.dimids = {0};
    v.nc_type = NC_DOUBLE;
    v.atts = {{"units", "days since 0001-01-01 00:00:00"}};
    v.ddata = &timev;
    vars.push_back(v);
    v = VarDef();
    v.name = "lat";
    v.dimids = {1};
    v.nc_type = NC_DOUBLE;
    v.atts = {{"units", "degrees_north"}};
    v.ddata = &j.lats;
    vars.push_back(v);
    v = VarDef();
    v.name = "lon";
    v.dimids = {2};
    v.nc_type = NC_DOUBLE;
    v.atts = {{"units", "degrees_east"}};
    v.ddata = &j.lons;
    vars.push_back(v);
    v = VarDef();
    v.name = "slat";
    v.dimids = {5};
    v.nc_type = NC_DOUBLE;
    v.atts = {{"units", "degrees_north"}};
    v.ddata = &slats;
    vars.push_back(v);
    v = VarDef();
    v.name = "slon";
    v.dimids = {6};
    v.nc_type = NC_DOUBLE;
    v.atts = {{"units", "degrees_east"}};
    v.ddata = &slons;
    vars.push_back(v);
  }
  for (size_t f = 0; f < j.names.size(); ++f) {
    VarDef v;
    v.name = j.names[f];
    v.nc_type = NC_FLOAT;
    v.atts = {{"units", j.units[f]}};
    if (j.vdims[f] == 0)
      v.dimids = {0, 1, 2};
    else if (j.vdims[f] == 1)
      v.dimids = {0, 3, 1, 2};
    else if (j.vdims[f] == 2)
      v.dimids = {0, 4, 1, 2};
    else if (j.vdims[f] == 3)
      v.dimids = {0, 3, 5, 2};
    else
      v.dimids = {0, 3, 1, 6};
    v.fdata = &j.data[f];
    vars.push_back(v);
  }

  // header
  Buf h;
  h.u8('C');
  h.u8('D');
  h.u8('F');
  h.u8(1);
  h.i32(0);  // numrecs (no record vars: time is a size-1 fixed dim)
  h.i32(NC_DIMENSION);
  h.i32(7);
  for (int d = 0; d < 7; ++d) {
    h.name(dimnames[d]);
    h.i32(dimsizes[d]);
  }
  h.i32(0);
  h.i32(0);  // no global attributes (ABSENT)

  // variable sizes and (deferred) offsets
  std::vector<int64_t> vsizes(vars.size());
  for (size_t i = 0; i < vars.size(); ++i) {
    int64_t n = 1;
    for (int d : vars[i].dimids) n *= dimsizes[d];
    int64_t bytes = n * (vars[i].nc_type == NC_FLOAT ? 4 : 8);
    vsizes[i] = (bytes + 3) & ~int64_t(3);
  }

  // serialize var_list twice: first pass with dummy offsets to learn the
  // header size, then with real offsets
  auto emit_vars = [&](Buf& b, const std::vector<int64_t>& offsets) {
    b.i32(NC_VARIABLE);
    b.i32((int32_t)vars.size());
    for (size_t i = 0; i < vars.size(); ++i) {
      const VarDef& v = vars[i];
      b.name(v.name);
      b.i32((int32_t)v.dimids.size());
      for (int d : v.dimids) b.i32(d);
      if (v.atts.empty()) {
        b.i32(0);
        b.i32(0);
      } else {
        b.i32(NC_ATTRIBUTE);
        b.i32((int32_t)v.atts.size());
        for (auto& a : v.atts) {
          b.name(a.first);
          b.i32(NC_CHAR);
          b.i32((int32_t)a.second.size());
          for (char c : a.second) b.u8((unsigned char)c);
          while (b.size() % 4) b.u8(0);
        }
      }
      b.i32(v.nc_type);
      b.i32((int32_t)vsizes[i]);
      b.i32((int32_t)offsets[i]);
    }
  };

  std::vector<int64_t> zero(vars.size(), 0);
  Buf probe = h;
  emit_vars(probe, zero);
  int64_t off = (int64_t)probe.size();
  std::vector<int64_t> offsets(vars.size());
  for (size_t i = 0; i < vars.size(); ++i) {
    offsets[i] = off;
    off += vsizes[i];
  }
  emit_vars(h, offsets);

  Buf body;
  for (size_t i = 0; i < vars.size(); ++i) {
    size_t before = body.size();
    if (vars[i].nc_type == NC_DOUBLE)
      for (double x : *vars[i].ddata) body.f64(x);
    else
      for (float x : *vars[i].fdata) body.f32(x);
    while ((int64_t)(body.size() - before) < vsizes[i]) body.u8(0);
  }

  FILE* fp = std::fopen(j.path.c_str(), "wb");
  if (!fp) return;
  std::fwrite(h.b.data(), 1, h.b.size(), fp);
  std::fwrite(body.b.data(), 1, body.b.size(), fp);
  std::fclose(fp);
}

// ---------------- async worker ----------------

struct HistIO {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv, cv_done;
  bool stop = false;
  int inflight = 0;
  std::thread worker;

  HistIO() {
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
      write_tape(job);
      {
        std::lock_guard<std::mutex> lk(mu);
        --inflight;
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* histio_create() { return new HistIO(); }

int histio_write_tape(void* handle, const char* path, int jm, int im,
                      int nlev, const double* lats, const double* lons,
                      double time_days, int nfields, const char** names,
                      const char** units, const int* vdims,
                      const float** data) {
  HistIO* h = static_cast<HistIO*>(handle);
  Job j;
  j.path = path;
  j.jm = jm;
  j.im = im;
  j.nlev = nlev;
  j.lats.assign(lats, lats + jm);
  j.lons.assign(lons, lons + im);
  j.time_days = time_days;
  for (int f = 0; f < nfields; ++f) {
    j.names.emplace_back(names[f]);
    j.units.emplace_back(units[f]);
    j.vdims.push_back(vdims[f]);
    int64_t n = (int64_t)jm * im;
    if (vdims[f] == 1) n *= nlev;
    if (vdims[f] == 2) n *= (nlev + 1);
    if (vdims[f] == 3) n = (int64_t)nlev * (jm - 1) * im;
    if (vdims[f] == 4) n = (int64_t)nlev * jm * im;
    j.data.emplace_back(data[f], data[f] + n);
  }
  {
    std::lock_guard<std::mutex> lk(h->mu);
    h->queue.push_back(std::move(j));
  }
  h->cv.notify_one();
  return 0;
}

int histio_pending(void* handle) {
  HistIO* h = static_cast<HistIO*>(handle);
  std::lock_guard<std::mutex> lk(h->mu);
  return (int)h->queue.size() + h->inflight;
}

void histio_flush(void* handle) {
  HistIO* h = static_cast<HistIO*>(handle);
  std::unique_lock<std::mutex> lk(h->mu);
  h->cv_done.wait(lk, [h] { return h->queue.empty() && h->inflight == 0; });
}

void histio_destroy(void* handle) {
  HistIO* h = static_cast<HistIO*>(handle);
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
