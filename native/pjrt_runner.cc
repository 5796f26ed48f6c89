// pjrt_runner: native PJRT-C-API benchmark loader (no Python).
//
// The reference's harness is a native binary driving the GPU runtime
// directly (cuda/main.cu); this is the TPU-build equivalent at the
// same layer: dlopen a PJRT plugin (libtpu.so on a pod,
// libaxon_pjrt.so on this rig, any conforming plugin elsewhere),
// create a client, compile a StableHLO program exported by
// tools/export_stablehlo.py, upload seeded inputs, execute N timed
// iterations, and read the outputs back -- the full benchmark hot path
// with no interpreter in the process.
//
// Usage:
//   pjrt_runner --plugin /opt/axon/libaxon_pjrt.so \
//               --program gain.stablehlo.mlir --spec gain.spec \
//               --runs 20 [--opt key=value ...] [--env KEY=VALUE ...]
//
// The .spec file (written by the exporter) has one line per input:
//   f32 128 512
// Options (--opt) become typed PJRT_NamedValues: integers when the
// value parses as one, strings otherwise (e.g. --opt topology=v5e:1x1x1
// --opt session_id=$(uuidgen) --opt remote_compile=1 for axon).
//
// Build: make -C native pjrt_runner (needs a pjrt_c_api.h; the
// Makefile points at the one bundled with the installed tensorflow).

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

void CheckErr(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args msg{};
  msg.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  msg.error = err;
  g_api->PJRT_Error_Message(&msg);
  std::fprintf(stderr, "pjrt_runner: %s failed: %.*s\n", what,
               static_cast<int>(msg.message_size), msg.message);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  std::exit(1);
}

void AwaitEvent(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = event;
  CheckErr(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = event;
  g_api->PJRT_Event_Destroy(&d);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "pjrt_runner: cannot read %s\n", path.c_str());
    std::exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct InputSpec {
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
  size_t elems() const {
    size_t n = 1;
    for (int64_t d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

std::vector<InputSpec> ParseSpec(const std::string& path) {
  std::vector<InputSpec> specs;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string ty;
    ss >> ty;
    InputSpec spec;
    if (ty == "f32") {
      spec.type = PJRT_Buffer_Type_F32;
    } else if (ty == "i32") {
      spec.type = PJRT_Buffer_Type_S32;
    } else {
      std::fprintf(stderr, "pjrt_runner: unsupported dtype %s\n", ty.c_str());
      std::exit(1);
    }
    int64_t d;
    while (ss >> d) spec.dims.push_back(d);
    specs.push_back(spec);
  }
  return specs;
}

// Seeded LCG matching utils/data.py's portability goal (values need not
// match the Python harness; the program's timing is data-independent).
float NextRand(uint64_t* state) {
  *state = *state * 6364136223846793005ULL + 1442695040888963407ULL;
  return 2.0f * ((*state >> 33) & 0xFFFFFF) / 16777216.0f - 1.0f;
}

double Percentile(std::vector<double> v, double p) {
  if (v.empty()) return 0.0;  // --runs 0: avoid size_t underflow
  std::sort(v.begin(), v.end());
  size_t idx = static_cast<size_t>(p * (v.size() - 1));
  return v[idx];
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin_path, program_path, spec_path, copts_path;
  int runs = 20;
  std::vector<std::pair<std::string, std::string>> opts;

  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto need = [&](const char* f) -> std::string {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "pjrt_runner: %s requires a value\n", f);
        std::exit(1);
      }
      return argv[++i];
    };
    if (arg == "--plugin") plugin_path = need("--plugin");
    else if (arg == "--compile-options") copts_path = need("--compile-options");
    else if (arg == "--program") program_path = need("--program");
    else if (arg == "--spec") spec_path = need("--spec");
    else if (arg == "--runs") runs = std::atoi(need("--runs").c_str());
    else if (arg == "--opt") {
      std::string kv = need("--opt");
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        std::fprintf(stderr, "pjrt_runner: --opt expects key=value\n");
        return 1;
      }
      opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (arg == "--env") {
      std::string kv = need("--env");
      size_t eq = kv.find('=');
      if (eq != std::string::npos)
        setenv(kv.substr(0, eq).c_str(), kv.substr(eq + 1).c_str(), 1);
    } else {
      std::fprintf(stderr, "pjrt_runner: unknown flag %s\n", arg.c_str());
      return 1;
    }
  }
  if (plugin_path.empty() || program_path.empty() || spec_path.empty()) {
    std::fprintf(stderr,
                 "usage: pjrt_runner --plugin P.so --program prog.mlir "
                 "--spec prog.spec [--runs N] [--opt k=v ...]\n");
    return 1;
  }

  // -- load the plugin -------------------------------------------------
  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    std::fprintf(stderr, "pjrt_runner: dlopen failed: %s\n", dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "pjrt_runner: plugin has no GetPjrtApi\n");
    return 1;
  }
  g_api = get_api();
  std::printf("plugin: %s (PJRT C API v%d.%d)\n", plugin_path.c_str(),
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CheckErr(g_api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");

  // -- create the client with typed named options ----------------------
  std::vector<PJRT_NamedValue> named;
  std::vector<int64_t> int_storage;
  int_storage.reserve(opts.size());
  for (auto& [k, v] : opts) {
    PJRT_NamedValue nv{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = k.c_str();
    nv.name_size = k.size();
    char* end = nullptr;
    long long as_int = std::strtoll(v.c_str(), &end, 10);
    if (end != v.c_str() && *end == '\0') {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = as_int;
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
    named.push_back(nv);
  }

  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = named.data();
  cc.num_options = named.size();
  CheckErr(g_api->PJRT_Client_Create(&cc), "Client_Create");
  PJRT_Client* client = cc.client;

  PJRT_Client_AddressableDevices_Args dev_args{};
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  CheckErr(g_api->PJRT_Client_AddressableDevices(&dev_args),
           "AddressableDevices");
  if (dev_args.num_addressable_devices == 0) {
    std::fprintf(stderr, "pjrt_runner: no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::printf("devices: %zu addressable\n", dev_args.num_addressable_devices);

  // -- compile the StableHLO program -----------------------------------
  std::string code = ReadFile(program_path);
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(code.data());
  program.code_size = code.size();
  const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  // Serialized xla CompileOptionsProto (tools/export_stablehlo.py
  // writes a 1-replica/1-partition default next to the program).
  std::string copts = copts_path.empty() ? std::string() : ReadFile(copts_path);
  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  auto t_compile0 = std::chrono::steady_clock::now();
  CheckErr(g_api->PJRT_Client_Compile(&comp), "Client_Compile");
  double compile_ms = std::chrono::duration<double, std::milli>(
                          std::chrono::steady_clock::now() - t_compile0)
                          .count();
  PJRT_LoadedExecutable* loaded = comp.executable;
  std::printf("compile: %.1f ms\n", compile_ms);

  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = loaded;
  CheckErr(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  CheckErr(g_api->PJRT_Executable_NumOutputs(&no), "NumOutputs");
  size_t num_outputs = no.num_outputs;

  // -- upload seeded inputs --------------------------------------------
  std::vector<InputSpec> specs = ParseSpec(spec_path);
  std::vector<PJRT_Buffer*> inputs;
  uint64_t rng = 42;
  std::vector<std::vector<float>> host_data(specs.size());
  // S32 inputs (e.g. playhead indices) get small non-negative ints:
  // float bit patterns reinterpreted as int32 are ~1e9-scale and would
  // send index-typed programs wildly out of bounds.
  for (size_t i = 0; i < specs.size(); ++i) {
    host_data[i].resize(specs[i].elems());
    if (specs[i].type == PJRT_Buffer_Type_S32) {
      int32_t* as_i32 = reinterpret_cast<int32_t*>(host_data[i].data());
      for (size_t j = 0; j < host_data[i].size(); ++j) {
        as_i32[j] = static_cast<int32_t>(
            (NextRand(&rng) * 0.5f + 0.5f) * 1000.0f);
      }
    } else {
      for (float& x : host_data[i]) x = NextRand(&rng);
    }
    PJRT_Client_BufferFromHostBuffer_Args hb{};
    hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    hb.client = client;
    hb.data = host_data[i].data();
    hb.type = specs[i].type;
    hb.dims = specs[i].dims.data();
    hb.num_dims = specs[i].dims.size();
    hb.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    hb.device = device;
    CheckErr(g_api->PJRT_Client_BufferFromHostBuffer(&hb),
             "BufferFromHostBuffer");
    AwaitEvent(hb.done_with_host_buffer, "host buffer transfer");
    inputs.push_back(hb.buffer);
  }
  std::printf("inputs: %zu uploaded, outputs: %zu\n", inputs.size(),
              num_outputs);

  // -- timed execution loop (one warmup + N runs) ----------------------
  auto run_once = [&](bool readback, double* out_ms) {
    PJRT_ExecuteOptions eo{};
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = inputs.data();
    std::vector<PJRT_Buffer*> out_buffers(num_outputs, nullptr);
    PJRT_Buffer** out_list = out_buffers.data();
    PJRT_Event* done = nullptr;

    PJRT_LoadedExecutable_Execute_Args ex{};
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = loaded;
    ex.options = &eo;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = inputs.size();
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;

    auto t0 = std::chrono::steady_clock::now();
    CheckErr(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    AwaitEvent(done, "device completion");

    double checksum = 0.0;
    if (readback && num_outputs > 0) {
      PJRT_Buffer_ToHostBuffer_Args th{};
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = out_buffers[0];
      th.dst = nullptr;
      CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
      std::vector<char> host(th.dst_size);
      th.dst = host.data();
      CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
      AwaitEvent(th.event, "device-to-host copy");
      const float* f = reinterpret_cast<const float*>(host.data());
      for (size_t i = 0; i < th.dst_size / 4 && i < 64; ++i) checksum += f[i];
    }
    *out_ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count();

    for (PJRT_Buffer* b : out_buffers) {
      PJRT_Buffer_Destroy_Args bd{};
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      g_api->PJRT_Buffer_Destroy(&bd);
    }
    return checksum;
  };

  double warm_ms = 0.0;
  double checksum = run_once(/*readback=*/true, &warm_ms);
  std::printf("warmup: %.3f ms (output[0:64] checksum %.6f)\n", warm_ms,
              checksum);

  std::vector<double> latencies;
  for (int i = 0; i < runs; ++i) {
    double ms = 0.0;
    run_once(/*readback=*/true, &ms);
    latencies.push_back(ms);
  }
  std::printf(
      "runs: %d  p50: %.3f ms  p95: %.3f ms  min: %.3f ms  max: %.3f ms\n",
      runs, Percentile(latencies, 0.50), Percentile(latencies, 0.95),
      Percentile(latencies, 0.0), Percentile(latencies, 1.0));

  // -- teardown ---------------------------------------------------------
  for (PJRT_Buffer* b : inputs) {
    PJRT_Buffer_Destroy_Args bd{};
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = b;
    g_api->PJRT_Buffer_Destroy(&bd);
  }
  PJRT_LoadedExecutable_Destroy_Args led{};
  led.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  led.executable = loaded;
  g_api->PJRT_LoadedExecutable_Destroy(&led);
  PJRT_Client_Destroy_Args cd{};
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  g_api->PJRT_Client_Destroy(&cd);
  return 0;
}
