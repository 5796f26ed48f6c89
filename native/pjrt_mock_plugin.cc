// pjrt_mock_plugin: a loopback PJRT plugin for hardware-free CI of
// pjrt_runner.cc (VERDICT r2 next #4).
//
// jaxlib in this image ships no standalone CPU PJRT .so (its CPU
// backend is linked into the Python extension), so the no-Python
// loader's compile->upload->execute->readback path had zero regression
// coverage off-hardware. This plugin implements exactly the C-API
// subset pjrt_runner.cc calls, with ONE semantic: the "program" must
// be a StableHLO module containing a multiply (the exported gain
// benchmark, tools/export_stablehlo.py); Execute returns 2 * input[0].
// The test (tests/test_pjrt_runner.py) then checks the runner's
// printed checksum against the same seeded LCG the runner documents --
// a true end-to-end run of every branch in the runner binary: dlopen,
// GetPjrtApi, version print, Plugin_Initialize, typed NamedValues,
// client create, device enumeration, compile, buffer upload with
// event await, N timed executes, D2H readback, checksum, teardown.
//
// Deliberately NOT a general interpreter: Compile() rejects programs
// without a multiply so the mock can never silently fake semantics it
// does not implement.
//
// Build: make -C native pjrt_mock  (same pjrt_c_api.h as pjrt_runner).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

// Opaque structs: the C API's handle types, backed by plain host data.
struct PJRT_Error {
  std::string message;
};
struct PJRT_Event {
  bool ready = true;
};
struct PJRT_Buffer {
  PJRT_Buffer_Type type = PJRT_Buffer_Type_F32;
  std::vector<int64_t> dims;
  std::vector<char> data;
};
struct PJRT_Device {
  int id = 0;
};
struct PJRT_Client {
  PJRT_Device device;
  std::vector<PJRT_Device*> devices;
};
struct PJRT_Executable {
  size_t num_outputs = 1;
};
struct PJRT_LoadedExecutable {
  PJRT_Executable exec;
};

namespace {

PJRT_Error* Err(const std::string& msg) { return new PJRT_Error{msg}; }

void ErrorMessage(PJRT_Error_Message_Args* args) {
  args->message = args->error->message.c_str();
  args->message_size = args->error->message.size();
}

void ErrorDestroy(PJRT_Error_Destroy_Args* args) { delete args->error; }

PJRT_Error* ErrorCode(PJRT_Error_GetCode_Args* args) {
  args->code = PJRT_Error_Code_INTERNAL;
  return nullptr;
}

PJRT_Error* EventAwait(PJRT_Event_Await_Args* args) {
  return args->event->ready ? nullptr : Err("event never completes");
}

PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* args) {
  delete args->event;
  return nullptr;
}

PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) {
  return nullptr;
}

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* args) {
  // Typed NamedValues are accepted (and type-checked) but unused: the
  // mock has no transport to configure.
  for (size_t i = 0; i < args->num_options; ++i) {
    const PJRT_NamedValue& nv = args->create_options[i];
    if (nv.type != PJRT_NamedValue_kInt64 &&
        nv.type != PJRT_NamedValue_kString &&
        nv.type != PJRT_NamedValue_kFloat &&
        nv.type != PJRT_NamedValue_kBool) {
      return Err("unsupported option type");
    }
  }
  auto* client = new PJRT_Client();
  client->devices.push_back(&client->device);
  args->client = client;
  return nullptr;
}

PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args* args) {
  delete args->client;
  return nullptr;
}

PJRT_Error* AddressableDevices(PJRT_Client_AddressableDevices_Args* args) {
  args->addressable_devices = args->client->devices.data();
  args->num_addressable_devices = args->client->devices.size();
  return nullptr;
}

PJRT_Error* ClientCompile(PJRT_Client_Compile_Args* args) {
  std::string code(args->program->code, args->program->code_size);
  std::string format(args->program->format, args->program->format_size);
  if (format != "mlir") return Err("mock plugin only accepts mlir programs");
  // Refuse anything this mock cannot faithfully execute: the one
  // program shape it implements is elementwise multiply (gain).
  if (code.find("stablehlo.multiply") == std::string::npos &&
      code.find("mhlo.multiply") == std::string::npos) {
    return Err("mock plugin implements only the multiply (gain) program");
  }
  args->executable = new PJRT_LoadedExecutable();
  return nullptr;
}

PJRT_Error* GetExecutable(PJRT_LoadedExecutable_GetExecutable_Args* args) {
  args->executable = &args->loaded_executable->exec;
  return nullptr;
}

PJRT_Error* NumOutputs(PJRT_Executable_NumOutputs_Args* args) {
  args->num_outputs = args->executable->num_outputs;
  return nullptr;
}

size_t TypeSize(PJRT_Buffer_Type t) {
  return t == PJRT_Buffer_Type_F32 || t == PJRT_Buffer_Type_S32 ? 4 : 0;
}

PJRT_Error* BufferFromHostBuffer(PJRT_Client_BufferFromHostBuffer_Args* args) {
  size_t esize = TypeSize(args->type);
  if (esize == 0) return Err("mock plugin: unsupported buffer type");
  size_t elems = 1;
  for (size_t i = 0; i < args->num_dims; ++i) {
    elems *= static_cast<size_t>(args->dims[i]);
  }
  auto* buf = new PJRT_Buffer();
  buf->type = args->type;
  buf->dims.assign(args->dims, args->dims + args->num_dims);
  buf->data.resize(elems * esize);
  std::memcpy(buf->data.data(), args->data, buf->data.size());
  args->buffer = buf;
  args->done_with_host_buffer = new PJRT_Event();
  return nullptr;
}

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* args) {
  delete args->buffer;
  return nullptr;
}

PJRT_Error* Execute(PJRT_LoadedExecutable_Execute_Args* args) {
  if (args->num_devices != 1) return Err("mock plugin is single-device");
  if (args->num_args < 1) return Err("gain program needs one input");
  const PJRT_Buffer* in = args->argument_lists[0][0];
  if (in->type != PJRT_Buffer_Type_F32) {
    return Err("gain program input must be f32");
  }
  auto* out = new PJRT_Buffer();
  out->type = in->type;
  out->dims = in->dims;
  out->data.resize(in->data.size());
  const float* src = reinterpret_cast<const float*>(in->data.data());
  float* dst = reinterpret_cast<float*>(out->data.data());
  for (size_t i = 0; i < in->data.size() / 4; ++i) dst[i] = 2.0f * src[i];
  args->output_lists[0][0] = out;
  if (args->device_complete_events != nullptr) {
    args->device_complete_events[0] = new PJRT_Event();
  }
  return nullptr;
}

PJRT_Error* ToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* args) {
  if (args->dst == nullptr) {
    args->dst_size = args->src->data.size();
    return nullptr;
  }
  std::memcpy(args->dst, args->src->data.data(), args->src->data.size());
  args->event = new PJRT_Event();
  return nullptr;
}

PJRT_Error* LoadedExecutableDestroy(
    PJRT_LoadedExecutable_Destroy_Args* args) {
  delete args->executable;
  return nullptr;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a{};
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = ErrorDestroy;
    a.PJRT_Error_Message = ErrorMessage;
    a.PJRT_Error_GetCode = ErrorCode;
    a.PJRT_Event_Await = EventAwait;
    a.PJRT_Event_Destroy = EventDestroy;
    a.PJRT_Plugin_Initialize = PluginInitialize;
    a.PJRT_Client_Create = ClientCreate;
    a.PJRT_Client_Destroy = ClientDestroy;
    a.PJRT_Client_AddressableDevices = AddressableDevices;
    a.PJRT_Client_Compile = ClientCompile;
    a.PJRT_Client_BufferFromHostBuffer = BufferFromHostBuffer;
    a.PJRT_LoadedExecutable_GetExecutable = GetExecutable;
    a.PJRT_LoadedExecutable_Destroy = LoadedExecutableDestroy;
    a.PJRT_LoadedExecutable_Execute = Execute;
    a.PJRT_Executable_NumOutputs = NumOutputs;
    a.PJRT_Buffer_Destroy = BufferDestroy;
    a.PJRT_Buffer_ToHostBuffer = ToHostBuffer;
    return a;
  }();
  return &api;
}
