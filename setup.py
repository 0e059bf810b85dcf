"""Build hook: pre-compile the native C++ runtime kernels at install time.

The reference builds its native engine with CMake (``CMakeLists.txt:245``);
here the native surface is two small host-runtime libraries
(``hyphy_tpu/native/{datapath,align}.cpp``) compiled with g++.  They are
also compiled lazily on first import, so this step is an optimization,
not a requirement — install never fails because of a missing toolchain.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


def _compile_native(src_dir: Path) -> None:
    for src in sorted(src_dir.glob("*.cpp")):
        lib = src.with_name(f"lib{src.stem}.so")
        if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
            continue
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(src), "-o", str(lib),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            print(f"built {lib.name}")
        except (OSError, subprocess.CalledProcessError) as exc:
            print(f"warning: native build of {src.name} skipped: {exc}",
                  file=sys.stderr)


class BuildWithNative(build_py):
    def run(self):
        _compile_native(Path(__file__).parent / "hyphy_tpu" / "native")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
