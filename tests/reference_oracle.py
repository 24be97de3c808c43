"""Load the *reference* PyTorch models directly as parity oracles.

Nothing is copied into the framework: the upstream sources are read from
/root/reference at test time (fixing the TabError in FN-SSL/Model.py:61 that
prevents a plain import) and exec'd in an isolated module namespace.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def load_reference_module(rel_path: str, name: str,
                          extra_sys_path: str | None = None,
                          stub_modules: tuple[str, ...] = (),
                          patches: tuple[tuple[str, str], ...] = ()):
    """Exec a reference file as a module, normalizing tab indentation.

    ``stub_modules`` names deps absent from this container (gpuRIR,
    webrtcvad, soundfile): they are injected as empty placeholder modules
    so import succeeds; tests must not touch code paths using them.
    ``patches`` are (old, new) source substitutions applied before exec —
    used to switch on dormant reference branches (e.g. ``track_enable``)
    as parity oracles.
    """
    src_path = REFERENCE / rel_path
    src = src_path.read_text()
    for old, new in patches:
        assert old in src, f"patch target not found in {rel_path}: {old!r}"
        src = src.replace(old, new)
    # FN-SSL/Model.py:61 mixes a literal tab into space-indented code.
    src = src.replace("\n\tself.is_doa = is_doa",
                      "\n        self.is_doa = is_doa")
    mod = types.ModuleType(name)
    mod.__file__ = str(src_path)
    if extra_sys_path:
        sys.path.insert(0, extra_sys_path)
    stubbed = []
    for sname in stub_modules:
        if sname not in sys.modules:
            sys.modules[sname] = types.ModuleType(sname)
            stubbed.append(sname)
    try:
        code = compile(src, str(src_path), "exec")
        exec(code, mod.__dict__)
    finally:
        if extra_sys_path:
            sys.path.remove(extra_sys_path)
        for sname in stubbed:
            del sys.modules[sname]
    return mod


def load_fnssl_torch():
    """Reference FN_SSL torch class (FN-SSL/Model.py)."""
    mod = load_reference_module("FN-SSL/Model.py", "ref_fnssl_model",
                                extra_sys_path=str(REFERENCE / "FN-SSL"))
    return mod.FN_SSL
