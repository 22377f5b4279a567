"""Minimal onnx stand-in for LOCAL verification of the torch-export oracle
tests (CI installs the real package). Backs torch's post-export proto scan
(_add_onnxscript_fn) with the first-party reader."""
__version__ = "1.16.0-deadtrees-stub"


class _Attr:
    g = None


class _Node:
    def __init__(self, op_type):
        self.domain = ""
        self.op_type = op_type
        self.attribute = []


class _Graph:
    def __init__(self, nodes):
        self.node = nodes


class ModelProto:
    def __init__(self, data=b""):
        self._data = data

    @property
    def graph(self):
        from deadtrees_tpu.models.onnx_io import read_onnx

        m = read_onnx(self._data)
        return _Graph([_Node(n.op_type) for n in m.nodes])

    def SerializeToString(self):
        return self._data

    def ParseFromString(self, data):
        self._data = data
        return self


def load_model_from_string(b, **k):
    return ModelProto(b)


def load_from_string(b, **k):
    return ModelProto(b)


def load(f, **k):
    data = open(f, "rb").read() if isinstance(f, str) else f.read()
    return ModelProto(data)


class checker:
    @staticmethod
    def check_model(*a, **k):
        pass
