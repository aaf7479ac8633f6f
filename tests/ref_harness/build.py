"""Build the reference whisper.cpp (CPU-only) + the ref_harness driver.

The reference tree at /root/reference is read-only and its vendored copy is
missing a few cmake helper modules (git-vars.cmake, build-info.cmake,
ggml/cmake/common.cmake, DefaultTargetOptions.cmake — stripped when it was
vendored into whisper-rs). We copy the tree to a scratch dir, regenerate
minimal stand-ins for those modules, and build `libwhisper.so` plus our
tests/ref_harness/ref_harness.c against it.

Everything is cached under $WHISPER_REF_BUILD (default
/tmp/whisper_ref_build); a content marker keyed on the harness source hash
triggers harness-only rebuilds. First build takes ~4 min; later runs are
no-ops.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from pathlib import Path

REF_SRC = Path("/root/reference/sys/whisper.cpp")
ROOT = Path(os.environ.get("WHISPER_REF_BUILD", "/tmp/whisper_ref_build"))
TREE = ROOT / "src_tree"
BUILD = ROOT / "build"
HARNESS_SRC = Path(__file__).with_name("ref_harness.c")
HARNESS_BIN = ROOT / "ref_harness"

_GIT_VARS = """\
set(GIT_SHA1 "unknown")
set(GIT_DATE "unknown")
set(GIT_COMMIT_SUBJECT "unknown")
"""

_BUILD_INFO = """\
set(BUILD_NUMBER 0)
set(BUILD_COMMIT "unknown")
set(BUILD_COMPILER "gcc")
set(BUILD_TARGET "linux")
"""

# upstream ggml/cmake/common.cmake equivalents (flag helper + arch detect)
_COMMON = """\
function(ggml_get_flags CCID CCVER)
    set(GF_C_FLAGS "" PARENT_SCOPE)
    set(GF_CXX_FLAGS "" PARENT_SCOPE)
endfunction()

function(ggml_get_system_arch)
    if (CMAKE_SYSTEM_PROCESSOR MATCHES "^(aarch64|arm.*|ARM64)$")
        set(GGML_SYSTEM_ARCH "ARM" PARENT_SCOPE)
    elseif (CMAKE_SYSTEM_PROCESSOR MATCHES "^(x86_64|i686|AMD64|amd64)$")
        set(GGML_SYSTEM_ARCH "x86" PARENT_SCOPE)
    elseif (CMAKE_SYSTEM_PROCESSOR MATCHES "ppc|power")
        set(GGML_SYSTEM_ARCH "PowerPC" PARENT_SCOPE)
    elseif (CMAKE_SYSTEM_PROCESSOR MATCHES "loongarch64")
        set(GGML_SYSTEM_ARCH "loongarch64" PARENT_SCOPE)
    elseif (CMAKE_SYSTEM_PROCESSOR MATCHES "riscv64")
        set(GGML_SYSTEM_ARCH "riscv64" PARENT_SCOPE)
    elseif (CMAKE_SYSTEM_PROCESSOR MATCHES "s390x")
        set(GGML_SYSTEM_ARCH "s390x" PARENT_SCOPE)
    else()
        set(GGML_SYSTEM_ARCH "UNKNOWN" PARENT_SCOPE)
    endif()
endfunction()
"""


_MEL_CALL = ("ctx->model.filters.n_mel, n_threads, ctx->model.filters, "
             "false, state->mel)")


def _patch_mel_dump(path: Path):
    """Re-enable the reference's own mel debug dump (src/whisper.cpp:3265
    writes log_mel_spectrogram.json, but its `debug` parameter is dead code
    — the only call site at :3892 hardcodes false). Gate it on an env var
    so the parity test can capture the reference's exact mel output."""
    src = path.read_text()
    assert _MEL_CALL in src, "mel call site changed; update _patch_mel_dump"
    src = src.replace(
        _MEL_CALL,
        _MEL_CALL.replace(
            "false", '(getenv("WHISPER_DEBUG_MEL") != NULL)'), 1)
    path.write_text(src)


def _run(cmd, **kw):
    subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.STDOUT, **kw)


def _lib_built() -> bool:
    return (BUILD / "src" / "libwhisper.so").exists()


def _harness_hash() -> str:
    return hashlib.sha256(HARNESS_SRC.read_bytes()).hexdigest()[:16]


def build_reference(timeout_s: int = 900) -> Path:
    """Return the path to the ref_harness binary, building as needed.

    Raises on failure (callers turn that into pytest.skip)."""
    if not REF_SRC.is_dir():
        raise RuntimeError(f"reference tree not found at {REF_SRC}")

    marker = ROOT / f"harness.{_harness_hash()}.ok"
    if HARNESS_BIN.exists() and marker.exists() and _lib_built():
        return HARNESS_BIN

    ROOT.mkdir(parents=True, exist_ok=True)

    if not _lib_built():
        if not TREE.is_dir():
            shutil.copytree(REF_SRC, TREE)
            (TREE / "cmake" / "git-vars.cmake").write_text(_GIT_VARS)
            (TREE / "cmake" / "build-info.cmake").write_text(_BUILD_INFO)
            (TREE / "cmake" / "DefaultTargetOptions.cmake").write_text(
                "# no-op stand-in\n")
            (TREE / "ggml" / "cmake").mkdir(exist_ok=True)
            (TREE / "ggml" / "cmake" / "common.cmake").write_text(_COMMON)
            _patch_mel_dump(TREE / "src" / "whisper.cpp")
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        subprocess.run(
            ["cmake", "-S", str(TREE), "-B", str(BUILD), *gen,
             "-DCMAKE_BUILD_TYPE=Release",
             "-DWHISPER_BUILD_TESTS=OFF", "-DWHISPER_BUILD_EXAMPLES=ON",
             "-DGGML_NATIVE=ON"],
            check=True, capture_output=True, timeout=timeout_s)
        subprocess.run(
            ["cmake", "--build", str(BUILD), "--target", "whisper",
             "--target", "whisper-cli"],
            check=True, capture_output=True, timeout=timeout_s)

    # harness: C-style C++ against the public header (C++ so it can link the
    # reference's own GBNF parser for grammar parity), rpath into the build
    lib_dirs = [BUILD / "src", BUILD / "ggml" / "src"]
    cmd = ["g++", "-O2", "-o", str(HARNESS_BIN),
           "-x", "c++", str(HARNESS_SRC),
           "-x", "c++", str(TREE / "examples" / "grammar-parser.cpp"),
           f"-I{TREE / 'include'}", f"-I{TREE / 'ggml' / 'include'}",
           f"-I{TREE / 'examples'}"]
    for d in lib_dirs:
        cmd += [f"-L{d}", f"-Wl,-rpath,{d}"]
    cmd += ["-lwhisper", "-lggml", "-lggml-base", "-lggml-cpu", "-lm"]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)

    for old in ROOT.glob("harness.*.ok"):
        old.unlink()
    marker.write_text("ok")
    return HARNESS_BIN


def reference_quantize(timeout_s: int = 900) -> Path:
    """Path to the reference quantize binary (examples/quantize/quantize.cpp),
    building the target if needed — used for K-quant codec parity."""
    binp = BUILD / "bin" / "quantize"
    if binp.exists():
        return binp
    build_reference(timeout_s)
    subprocess.run(
        ["cmake", "--build", str(BUILD), "--target", "quantize"],
        check=True, capture_output=True, timeout=timeout_s)
    if not binp.exists():
        raise RuntimeError("quantize binary not produced")
    return binp


def reference_cli(timeout_s: int = 900) -> Path:
    """Path to the reference whisper-cli binary (examples/cli/cli.cpp),
    building the tree if needed — used for output-writer format parity."""
    cli = BUILD / "bin" / "whisper-cli"
    if cli.exists():
        return cli
    build_reference(timeout_s)
    if not cli.exists():  # tree predates EXAMPLES=ON: build the target
        subprocess.run(
            ["cmake", "-S", str(TREE), "-B", str(BUILD),
             "-DWHISPER_BUILD_EXAMPLES=ON"],
            check=True, capture_output=True, timeout=timeout_s)
        subprocess.run(
            ["cmake", "--build", str(BUILD), "--target", "whisper-cli"],
            check=True, capture_output=True, timeout=timeout_s)
    return cli
