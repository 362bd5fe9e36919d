// SAR-YOLO-TPU C++ deploy client: exported TF SavedModel + native pre/postprocess.
//
// Counterpart of the reference's C++ inference examples
// (examples/YOLOv8-CPP-Inference, YOLOv8-LibTorch-CPP-Inference — SURVEY §2.9):
// loads the SavedModel produced by `model.export(format="saved_model")` through
// the TensorFlow C API (stable ABI), letterboxes a PPM image with the shared
// native library (csrc/), runs the graph, and applies greedy NMS from the same
// library. Pre/postprocess here matches the Python/jnp pipeline bit-for-bit
// within rounding, so deploy parity is testable.
//
// Build: `make` (links the TF runtime shipped inside the tensorflow wheel).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "tensorflow/c/c_api.h"

extern "C" float sy_letterbox_u8(const uint8_t*, int, int, uint8_t*, int, int, int,
                                 int*, int*);
extern "C" int sy_nms(const float*, const float*, int, float, int, int*);

static bool read_ppm(const std::string& path, std::vector<uint8_t>* data, int* h, int* w) {
  std::ifstream f(path, std::ios::binary);
  std::string magic;
  int maxv;
  f >> magic >> *w >> *h >> maxv;
  if (magic != "P6" || maxv != 255) return false;
  f.get();
  data->resize((size_t)*h * *w * 3);
  f.read(reinterpret_cast<char*>(data->data()), (long)data->size());
  return bool(f);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <saved_model_dir> <image.ppm> [imgsz=640]\n", argv[0]);
    return 1;
  }
  const char* model_dir = argv[1];
  const std::string image_path = argv[2];
  const int imgsz = argc > 3 ? std::atoi(argv[3]) : 640;

  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  const char* tags = "serve";
  TF_Session* session = TF_LoadSessionFromSavedModel(opts, nullptr, model_dir, &tags, 1,
                                                     graph, nullptr, status);
  if (TF_GetCode(status) != TF_OK) {
    std::fprintf(stderr, "load failed: %s\n", TF_Message(status));
    return 2;
  }

  // locate the serving signature ops: the placeholder input + the call output
  TF_Operation* in_op = nullptr;
  TF_Operation* out_op = nullptr;
  size_t pos = 0;
  TF_Operation* op;
  while ((op = TF_GraphNextOperation(graph, &pos)) != nullptr) {
    std::string name = TF_OperationName(op);
    std::string type = TF_OperationOpType(op);
    if (!in_op && type == "Placeholder" && name.rfind("serving_default", 0) == 0)
      in_op = op;
  }
  // the serving function is the call op fed (directly) by the input placeholder
  pos = 0;
  while ((op = TF_GraphNextOperation(graph, &pos)) != nullptr) {
    std::string type = TF_OperationOpType(op);
    if (type != "StatefulPartitionedCall" && type != "PartitionedCall") continue;
    int n_in = TF_OperationNumInputs(op);
    for (int i = 0; i < n_in; ++i) {
      TF_Output src = TF_OperationInput(TF_Input{op, i});
      if (src.oper == in_op) {
        out_op = op;
        break;
      }
    }
    if (out_op) break;
  }
  if (!in_op || !out_op) {
    std::fprintf(stderr, "could not locate serving ops in graph\n");
    return 3;
  }

  std::vector<uint8_t> img;
  int h = 0, w = 0;
  if (!read_ppm(image_path, &img, &h, &w)) {
    std::fprintf(stderr, "cannot read PPM %s\n", image_path.c_str());
    return 4;
  }
  std::vector<uint8_t> lb((size_t)imgsz * imgsz * 3);
  int px = 0, py = 0;
  float r = sy_letterbox_u8(img.data(), h, w, lb.data(), imgsz, 0, 114, &px, &py);

  const int64_t dims[4] = {1, imgsz, imgsz, 3};
  TF_Tensor* input = TF_AllocateTensor(TF_UINT8, dims, 4, lb.size());
  std::memcpy(TF_TensorData(input), lb.data(), lb.size());

  TF_Output in_port{in_op, 0};
  TF_Output out_port{out_op, 0};
  TF_Tensor* output = nullptr;
  TF_SessionRun(session, nullptr, &in_port, &input, 1, &out_port, &output, 1,
                nullptr, 0, nullptr, status);
  if (TF_GetCode(status) != TF_OK) {
    std::fprintf(stderr, "run failed: %s\n", TF_Message(status));
    return 5;
  }

  // raw preds (1, N, 4+nc): xywh + class scores -> native greedy NMS
  const float* preds = static_cast<const float*>(TF_TensorData(output));
  const int N = (int)TF_Dim(output, 1);
  const int no = (int)TF_Dim(output, 2);
  const int nc = no - 4;
  std::vector<float> boxes;
  std::vector<float> scores;
  std::vector<int> classes;
  for (int i = 0; i < N; ++i) {
    const float* row = preds + (size_t)i * no;
    float best = 0.f;
    int cls = 0;
    for (int c = 0; c < nc; ++c)
      if (row[4 + c] > best) { best = row[4 + c]; cls = c; }
    if (best < 0.25f) continue;
    float off = cls * 7680.f;  // class-aware NMS via coordinate offset
    boxes.insert(boxes.end(), {row[0] - row[2] / 2 + off, row[1] - row[3] / 2,
                               row[0] + row[2] / 2 + off, row[1] + row[3] / 2});
    scores.push_back(best);
    classes.push_back(cls);
  }
  std::vector<int> keep(300);
  int kept = sy_nms(boxes.data(), scores.data(), (int)scores.size(), 0.7f, 300,
                    keep.data());
  std::printf("%d detections\n", kept);
  for (int k = 0; k < kept; ++k) {
    int i = keep[k];
    float off = classes[i] * 7680.f;
    std::printf("cls=%d conf=%.3f box=[%.1f %.1f %.1f %.1f]\n", classes[i], scores[i],
                (boxes[4 * i] - off - px) / r, (boxes[4 * i + 1] - py) / r,
                (boxes[4 * i + 2] - off - px) / r, (boxes[4 * i + 3] - py) / r);
  }
  TF_DeleteTensor(input);
  TF_DeleteTensor(output);
  TF_DeleteSession(session, status);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  return 0;
}
