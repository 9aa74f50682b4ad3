"""AOT executable cache: compile -> serialize -> reload roundtrip."""
import numpy as np

import conftest  # noqa: F401


def test_load_or_compile_roundtrip(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import load_or_compile, fingerprint

    logs = []
    x = jnp.arange(8.0, dtype=jnp.float32)

    def fn(x):
        return x * 2 + 1

    c1 = load_or_compile(fn, (x,), name="t", cache_dir=str(tmp_path),
                         log=logs.append)
    np.testing.assert_allclose(np.asarray(c1(x)), np.arange(8.0) * 2 + 1)
    assert any("serialized" in m for m in logs)

    # second call loads from disk (same fingerprint)
    logs.clear()
    c2 = load_or_compile(fn, (x,), name="t", cache_dir=str(tmp_path),
                         log=logs.append)
    np.testing.assert_allclose(np.asarray(c2(x)), np.arange(8.0) * 2 + 1)
    assert any("loaded" in m for m in logs)

    # a different shape gets a different fingerprint -> fresh compile
    assert fingerprint((x,)) != fingerprint((x[:4],))
    # a config change does too
    assert fingerprint((x,), config="a") != fingerprint((x,), config="b")


def test_stale_entries_pruned(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.utils import aot_cache

    def fn(x):
        return x + 1

    aot_cache.load_or_compile(fn, (jnp.zeros(4),), name="p",
                              cache_dir=str(tmp_path))
    aot_cache.load_or_compile(fn, (jnp.zeros(8),), name="p",
                              cache_dir=str(tmp_path))
    entries = list(tmp_path.glob("aot_p_*.pkl"))
    assert len(entries) == 1          # the shape-4 entry was superseded


def test_retry_transient_retries_tunnel_errors_only(monkeypatch):
    """bench.retry_transient: transient remote-compile failures retry,
    real failures (OOM) surface immediately."""
    import sys, os, time
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    monkeypatch.setattr(time, "sleep", lambda s: None)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
                "response body closed before all bytes were read")
        return 42

    assert bench.retry_transient(flaky, "x") == 42
    assert calls["n"] == 3

    def oom():
        raise RuntimeError("RESOURCE_EXHAUSTED: HBM out of memory while "
                           "talking to remote_compile")

    import pytest
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.retry_transient(oom, "x")

    calls["n"] = 0

    def count_always():
        calls["n"] += 1
        raise RuntimeError("remote_compile: HTTP 500: helper crashed")

    with pytest.raises(RuntimeError, match="HTTP 500"):
        bench.retry_transient(count_always, "x", attempts=2)
    assert calls["n"] == 2


def _write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_import_closure_scoped_keying(tmp_path):
    """Fingerprint keys on the function's static import closure: editing a
    module OUTSIDE the closure leaves the key (and so the AOT entry) valid;
    editing a module INSIDE it invalidates (VERDICT r2 next-#5)."""
    from fantasy_world_tpu.utils import aot_cache

    pkg = tmp_path / "fakepkg"
    _write(pkg / "__init__.py", "")
    _write(pkg / "ops" / "__init__.py", "")
    _write(pkg / "ops" / "used.py", "X = 1\n")
    _write(pkg / "ops" / "helper.py", "Y = 2\n")
    _write(pkg / "serving" / "__init__.py", "")
    _write(pkg / "serving" / "server.py", "Z = 3\n")
    # root module imports ops.used (top-level), ops.helper (lazily inside a
    # function body -- still a dep), and nothing from serving/
    _write(pkg / "entry.py",
           "from fakepkg.ops.used import X\n"
           "def f():\n"
           "    from fakepkg.ops import helper\n"
           "    return helper.Y\n")

    root = str(pkg / "entry.py")
    cl = aot_cache._import_closure(root, pkg_root=str(pkg))
    rel = sorted(str(p).split("fakepkg/")[-1] for p in cl)
    assert "ops/used.py" in rel and "ops/helper.py" in rel
    assert "entry.py" in rel and "__init__.py" in rel
    assert not any(r.startswith("serving") for r in rel)

    h0 = aot_cache._closure_hash(root, pkg_root=str(pkg))
    # editing an unrelated module leaves the closure hash unchanged
    aot_cache._CLOSURE_MEMO.clear()
    _write(pkg / "serving" / "server.py", "Z = 999  # edited\n")
    assert aot_cache._closure_hash(root, pkg_root=str(pkg)) == h0
    # editing a module inside the closure invalidates
    aot_cache._CLOSURE_MEMO.clear()
    _write(pkg / "ops" / "helper.py", "Y = 22  # edited\n")
    assert aot_cache._closure_hash(root, pkg_root=str(pkg)) != h0


def test_import_closure_relative_and_getattr(tmp_path):
    """Relative imports resolve against the importing module's package;
    imports inside a PEP-562 module-level __getattr__ are NOT deps of code
    that never accesses a lazy attribute (access IS tracked -- see
    test_lazy_attribute_access_pulls_getattr_deps)."""
    from fantasy_world_tpu.utils import aot_cache

    pkg = tmp_path / "fakepkg"
    # root __init__ with a lazy __getattr__ accessor -> big.py must NOT
    # leak into every closure through the parent-__init__ rule
    _write(pkg / "__init__.py",
           "def __getattr__(name):\n"
           "    from .big import Everything\n"
           "    return Everything\n")
    _write(pkg / "big.py", "Everything = object()\n")
    _write(pkg / "models" / "__init__.py", "")
    _write(pkg / "models" / "net.py",
           "from ..ops.kernel import k\nfrom . import sibling\n")
    _write(pkg / "models" / "sibling.py", "S = 1\n")
    _write(pkg / "ops" / "__init__.py", "")
    _write(pkg / "ops" / "kernel.py", "k = lambda: 0\n")

    cl = aot_cache._import_closure(str(pkg / "models" / "net.py"),
                                   pkg_root=str(pkg))
    rel = sorted(str(p).split("fakepkg/")[-1] for p in cl)
    assert "ops/kernel.py" in rel          # .. relative import resolved
    assert "models/sibling.py" in rel      # from . import sibling resolved
    assert "big.py" not in rel             # __getattr__ import excluded


def test_fingerprint_scoped_to_fn_bytecode(tmp_path):
    """fingerprint(fn=...) keys on fn's bytecode: two different lambdas in
    the same module get different keys; the same source hash is shared."""
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    x = jnp.zeros(4)
    f1 = lambda v: v + 1    # noqa: E731
    f2 = lambda v: v + 2    # noqa: E731
    f1b = lambda v: v + 1   # noqa: E731
    assert fingerprint((x,), fn=f1) != fingerprint((x,), fn=f2)
    assert fingerprint((x,), fn=f1) == fingerprint((x,), fn=f1b)
    # scoped key differs from the whole-package fallback key
    assert fingerprint((x,), fn=f1) != fingerprint((x,))


def test_bench_closure_excludes_unrelated_modules():
    """The real bench.py closure stays clear of serving/, training/, cli/:
    editing those cannot invalidate bench AOT entries."""
    import os
    from fantasy_world_tpu.utils.aot_cache import _import_closure

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(here, "bench.py")
    rels = [os.path.relpath(p, os.path.join(here, "fantasy_world_tpu"))
            for p in _import_closure(bench)]
    assert any(r == os.path.join("models", "fusion", "model.py")
               for r in rels), "bench must depend on the fusion model"
    for banned in ("serving", "training", "cli"):
        assert not any(r.split(os.sep)[0] == banned for r in rels), (
            f"bench closure leaked {banned}/")


def test_lazy_attribute_access_pulls_getattr_deps(tmp_path):
    """`from pkg import LazyName` executes pkg/__init__'s __getattr__ hook
    at import time, so the hook's imports ARE deps of the accessor -- while
    a module that merely imports a submodule stays narrow."""
    from fantasy_world_tpu.utils import aot_cache

    pkg = tmp_path / "fakepkg"
    _write(pkg / "__init__.py",
           "def __getattr__(name):\n"
           "    from .big import Everything\n"
           "    return Everything\n")
    _write(pkg / "big.py", "from .ops.kernel import k\nEverything = k\n")
    _write(pkg / "ops" / "__init__.py", "")
    _write(pkg / "ops" / "kernel.py", "k = lambda: 0\n")
    # accessor: triggers the lazy attr -> big.py (and ITS deps) included
    _write(pkg / "user.py", "from fakepkg import Everything\n")
    # bystander: imports a real submodule -> big.py stays out
    _write(pkg / "other.py", "from fakepkg.ops import kernel\n")

    aot_cache._CLOSURE_MEMO.clear()
    rel_user = sorted(str(p).split("fakepkg/")[-1] for p in
                      aot_cache._import_closure(str(pkg / "user.py"),
                                                pkg_root=str(pkg)))
    assert "big.py" in rel_user
    assert "ops/kernel.py" in rel_user       # big.py's own deps follow
    rel_other = sorted(str(p).split("fakepkg/")[-1] for p in
                       aot_cache._import_closure(str(pkg / "other.py"),
                                                 pkg_root=str(pkg)))
    assert "big.py" not in rel_other
    aot_cache._CLOSURE_MEMO.clear()


def test_same_file_helper_edit_invalidates_fingerprint():
    """Editing a helper the cached fn calls -- in the SAME file, outside
    any package -- must change the fingerprint: the scope hash follows the
    same-file function graph, not just fn's own bytecode."""
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    ns1, ns2 = {}, {}
    src1 = "def helper(x):\n    return x * 2\nfn = lambda v: helper(v)\n"
    src2 = "def helper(x):\n    return x * 3\nfn = lambda v: helper(v)\n"
    code1 = compile(src1, __file__, "exec")   # same file -> same closure
    code2 = compile(src2, __file__, "exec")
    exec(code1, ns1)
    exec(code2, ns2)
    x = jnp.zeros(4)
    assert fingerprint((x,), fn=ns1["fn"]) != fingerprint((x,), fn=ns2["fn"])

    # and closure-cell / default values participate too
    def make(c):
        return lambda v: v + c
    assert fingerprint((x,), fn=make(1)) != fingerprint((x,), fn=make(2))


def test_fingerprint_set_constants_deterministic():
    """A set literal in the cached fn compiles to a frozenset co_const whose
    repr order depends on PYTHONHASHSEED; the fingerprint must not."""
    import subprocess, sys, os
    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax.numpy as jnp\n"
        "from fantasy_world_tpu.utils.aot_cache import fingerprint\n"
        "fn = lambda v: v if 'a' in {'alpha', 'beta', 'gamma', 'delta'} "
        "else -v\n"
        "print(fingerprint((jnp.zeros(4),), fn=fn))\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fps = set()
    for seed in ("0", "1", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed, JAX_PLATFORMS="cpu")
        # the axon sitecustomize re-pins the TPU whenever this is set,
        # defeating JAX_PLATFORMS=cpu -- the child would then block on the
        # tunnel (measured: a tunnel outage turned this test into a
        # 120 s TimeoutExpired)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run([sys.executable, "-c", prog], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr
        fps.add(out.stdout.strip().splitlines()[-1])
    assert len(fps) == 1, f"fingerprint varies with hash seed: {fps}"


def test_value_bindings_invalidate_fingerprint():
    """Constants, partial bound args and container cells reachable from the
    cached fn participate in the fingerprint -- for an out-of-package root
    (bench.py style) these appear in no hashed source file, so value
    hashing is the only staleness defense."""
    import functools
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    x = jnp.zeros(4)

    def build(src):
        ns = {"functools": functools}
        exec(compile(src, __file__, "exec"), ns)
        return ns["fn"]

    # module-level constant referenced via globals
    a = build("SCALE = 2\nfn = lambda v: v * SCALE\n")
    b = build("SCALE = 3\nfn = lambda v: v * SCALE\n")
    assert fingerprint((x,), fn=a) != fingerprint((x,), fn=b)

    # partial bound keyword, partial discovered as a global value
    a = build("def impl(v, s):\n    return v * s\n"
              "run = functools.partial(impl, s=2)\n"
              "fn = lambda v: run(v)\n")
    b = build("def impl(v, s):\n    return v * s\n"
              "run = functools.partial(impl, s=3)\n"
              "fn = lambda v: run(v)\n")
    assert fingerprint((x,), fn=a) != fingerprint((x,), fn=b)

    # list captured in a closure cell
    def make(taps):
        return lambda v: v + len(taps)
    assert (fingerprint((x,), fn=make([1, 2]))
            != fingerprint((x,), fn=make([1, 2, 3])))

    # dict values participate and hash order-independently
    assert (fingerprint((x,), fn=make({"a": 1, "b": 2}))
            == fingerprint((x,), fn=make({"b": 2, "a": 1})))
    assert (fingerprint((x,), fn=make({"a": 1}))
            != fingerprint((x,), fn=make({"a": 2})))


def test_dataclass_bindings_fingerprint_by_field_values():
    """A captured config dataclass must fingerprint by its FIELD VALUES --
    bench.py's timed lambdas close over e.g. a DPTHeadConfig whose literals
    appear in no hashed source file."""
    import dataclasses
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    @dataclasses.dataclass(frozen=True)
    class HeadCfg:
        taps: int
        act: str

    x = jnp.zeros(4)

    def make(cfg):
        return lambda v: v if cfg.act == "exp" else -v

    assert (fingerprint((x,), fn=make(HeadCfg(2, "exp")))
            != fingerprint((x,), fn=make(HeadCfg(2, "inv_log"))))
    assert (fingerprint((x,), fn=make(HeadCfg(2, "exp")))
            == fingerprint((x,), fn=make(HeadCfg(2, "exp"))))


def test_array_bindings_fingerprint_by_content():
    """A captured constant TABLE whose VALUES change must change the
    fingerprint -- shape/dtype alone would silently reload the executable
    with the old constants baked in (bench.py-style out-of-package roots
    have no hashed source to catch the edit)."""
    import numpy as np
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    x = jnp.zeros(4)

    def make(table):
        return lambda v: v + table[0]

    assert (fingerprint((x,), fn=make(np.asarray([1.0, 2.0])))
            != fingerprint((x,), fn=make(np.asarray([3.0, 4.0]))))
    assert (fingerprint((x,), fn=make(np.asarray([1.0, 2.0])))
            == fingerprint((x,), fn=make(np.asarray([1.0, 2.0]))))
    # same content, different shape/dtype still distinguish
    assert (fingerprint((x,), fn=make(np.zeros(2, np.float32)))
            != fingerprint((x,), fn=make(np.zeros(2, np.float64))))


def test_kwonly_default_participates_in_fingerprint():
    """Keyword-only defaults live in __kwdefaults__, not __defaults__; an
    edit there changes neither bytecode nor __defaults__ and must still
    invalidate."""
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import fingerprint

    x = jnp.zeros(4)

    def build(src):
        ns = {}
        exec(compile(src, __file__, "exec"), ns)
        return ns["fn"]

    a = build("def impl(v, *, s=2):\n    return v * s\n"
              "fn = lambda v: impl(v)\n")
    b = build("def impl(v, *, s=3):\n    return v * s\n"
              "fn = lambda v: impl(v)\n")
    assert fingerprint((x,), fn=a) != fingerprint((x,), fn=b)
    # positional defaults keep working too
    a = build("def impl(v, s=2):\n    return v * s\nfn = lambda v: impl(v)\n")
    b = build("def impl(v, s=3):\n    return v * s\nfn = lambda v: impl(v)\n")
    assert fingerprint((x,), fn=a) != fingerprint((x,), fn=b)
