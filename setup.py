"""Build hook: compile the native host engine into the wheel.

The pure-Python package auto-builds libmjentropy.so on first import
(developer flow); wheels built through this hook ship it precompiled
with the pinned flag set from mozjpeg_tpu/native/build.py (the analog
of the reference's CMake flags, CMakeLists.txt:223-260). Set
MJ_NATIVE_PORTABLE=1 to build a distributable (non -march=native)
binary."""
import os

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mozjpeg_tpu", "native")
        out_dir = os.path.join(self.build_lib, "mozjpeg_tpu", "native")
        os.makedirs(out_dir, exist_ok=True)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "_mj_native_build", os.path.join(src, "build.py"))
        _b = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_b)
        _b.build(src, os.path.join(out_dir, _b.LIB_NAME))


setup(cmdclass={"build_py": BuildWithNative})
