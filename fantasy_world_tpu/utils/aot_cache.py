"""Ahead-of-time compiled-executable cache.

The persistent XLA compilation cache (``jax_compilation_cache_dir``) only
skips the XLA compile; tracing + Pallas/Mosaic lowering of a large model
still costs minutes per process (measured 2026-08 on a tunneled v5e:
~250-340 s for the fusion forward, cache hit or not). For production
serving and benchmarking, that cold-start is unacceptable, so this module
snapshots the COMPILED executable via
``jax.experimental.serialize_executable`` and reloads it directly --
skipping trace, lowering, and compile entirely (reload through the tunnel:
60-270 s, dominated by executable transfer).

Cache keys fingerprint (a) the sources the function can actually reach --
the static import closure of its defining module (falling back to every
.py in the package when the source can't be located), the function's own
bytecode, the bytecode of every same-file function or partial it reaches
through globals/cells/defaults (transitively, bound args included), and
the shape/dtype, deterministic value or type identity of every other
binding it references -- (b) a caller-supplied config
string, and (c) the arg shapes/dtypes, so a stale executable can never be
silently loaded after a code or shape change, while an edit to an
unrelated module (e.g. serving/) or to an unreferenced sibling function
leaves entries valid. Entries are plain
pickle files: executables are machine/topology-specific, so the cache
directory should live on the machine (or image) that runs them; loading
falls back to a fresh compile on any mismatch.

Replaces, on TPU terms, what the reference lacks entirely -- its torch
pipeline re-traces CUDA graphs per process (SURVEY.md section 5: no
checkpoint/resume of compiled state).
"""
from __future__ import annotations

import ast
import glob
import hashlib
import inspect
import os
import pickle
from typing import Any, Callable, List, Optional, Sequence, Set

import jax

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_HASH: Optional[str] = None
_CLOSURE_MEMO: dict = {}


def _package_source_hash() -> str:
    """md5 over every .py under fantasy_world_tpu/ (cached per process)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.md5()
        for dirpath, dirnames, filenames in sorted(os.walk(_PKG_ROOT)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()
    return _SRC_HASH


def _resolve_module(parts: Sequence[str], pkg_root: str) -> Optional[str]:
    """Package-relative module parts -> file path (module.py or
    pkg/__init__.py), or None if it isn't a module of the package."""
    base = os.path.join(pkg_root, *parts) if parts else pkg_root
    if parts and os.path.isfile(base + ".py"):
        return base + ".py"
    init = os.path.join(base, "__init__.py")
    if os.path.isfile(init):
        return init
    return None


def _walk_imports(nodes, path: str, pkg_root: str, pkg_name: str,
                  follow_lazy: bool) -> Set[str]:
    """In-package deps of the import statements under ``nodes`` (AST nodes
    whose source lives in file ``path``). Parent ``__init__.py`` files of
    every imported module are included -- Python executes them on import.

    ``follow_lazy``: when a ``from <mod> import <name>`` alias does NOT
    resolve to a submodule, the name may be a PEP-562 lazy attribute of
    <mod>'s module-level ``__getattr__`` -- accessing it at runtime executes
    the hook's imports, so those become deps too (one level: lazy attrs
    exposed by modules the hook itself imports are not chased)."""
    in_pkg = os.path.abspath(path).startswith(pkg_root + os.sep)
    deps: Set[str] = set()

    def add_prefixes(parts, aliases=()):
        for i in range(len(parts) + 1):
            f = _resolve_module(parts[:i], pkg_root)
            if f:
                deps.add(f)
        for alias in aliases:
            if alias == "*":
                continue
            f = _resolve_module(list(parts) + [alias], pkg_root)
            if f:
                deps.add(f)
            elif follow_lazy:
                target = _resolve_module(list(parts), pkg_root)
                if target:
                    deps.update(
                        _getattr_deps(target, pkg_root, pkg_name))

    for top in nodes:
        for node in ast.walk(top):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = alias.name
                    if name == pkg_name or name.startswith(pkg_name + "."):
                        add_prefixes(name.split(".")[1:])
            elif isinstance(node, ast.ImportFrom):
                if node.level == 0:
                    mod = node.module or ""
                    if not (mod == pkg_name
                            or mod.startswith(pkg_name + ".")):
                        continue
                    parts = mod.split(".")[1:]
                else:
                    if not in_pkg:
                        continue
                    rel = os.path.relpath(os.path.abspath(path), pkg_root)
                    # the file's package = its directory (true for modules
                    # and for __init__.py, whose package is the directory)
                    cur_pkg = rel.split(os.sep)[:-1]
                    drop = node.level - 1
                    if drop > len(cur_pkg):
                        continue
                    base = cur_pkg[:len(cur_pkg) - drop] if drop else cur_pkg
                    parts = base + [p for p in
                                    (node.module or "").split(".") if p]
                add_prefixes(parts, [a.name for a in node.names])
    return deps


def _parse(path: str):
    try:
        with open(path, "rb") as fh:
            return ast.parse(fh.read())
    except (OSError, SyntaxError):
        return None


def _getattr_deps(path: str, pkg_root: str, pkg_name: str) -> Set[str]:
    """Deps of the imports inside ``path``'s module-level PEP-562
    ``__getattr__`` hook (empty when there is none). These run whenever any
    code accesses one of the module's lazy attributes."""
    memo_key = (os.path.abspath(path), "getattr")
    if memo_key in _CLOSURE_MEMO:
        return _CLOSURE_MEMO[memo_key]
    tree = _parse(path)
    hooks = [] if tree is None else [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "__getattr__"]
    deps = _walk_imports(hooks, path, pkg_root, pkg_name,
                         follow_lazy=False) if hooks else set()
    _CLOSURE_MEMO[memo_key] = deps
    return deps


def _direct_deps(path: str, pkg_root: str, pkg_name: str) -> Set[str]:
    """Static imports of one source file that land inside the package,
    including lazy (function-body) imports.

    A module-level PEP-562 ``__getattr__`` hook is excluded from the plain
    import walk (its imports don't run on ``import mod``), but any
    ``from <mod> import <name>`` where <name> is not a real submodule is
    treated as a lazy-attribute access and pulls in <mod>'s hook imports
    via ``_getattr_deps`` -- so code that actually triggers the lazy load
    is invalidated by edits to the lazily-loaded module, while unrelated
    closures stay narrow. (Attribute-style access ``mod.Name`` after a
    plain import is not statically tracked -- same undetectable class as
    ``getattr(mod, name)``.)"""
    tree = _parse(path)
    if tree is None:
        return set()
    tree.body = [n for n in tree.body
                 if not (isinstance(n, ast.FunctionDef)
                         and n.name == "__getattr__")]
    return _walk_imports([tree], path, pkg_root, pkg_name, follow_lazy=True)


def _import_closure(root_file: str, pkg_root: str = _PKG_ROOT) -> List[str]:
    """Transitive in-package import closure reachable from ``root_file``
    (which may live outside the package, e.g. bench.py; then only its
    package deps are returned). Sorted file paths."""
    pkg_root = os.path.abspath(pkg_root)
    pkg_name = os.path.basename(pkg_root)
    root_file = os.path.abspath(root_file)
    seen: Set[str] = set()
    if root_file.startswith(pkg_root + os.sep):
        seen.add(root_file)
        # importing an in-package module executes every parent __init__.py
        pkg_parts = os.path.relpath(root_file, pkg_root).split(os.sep)[:-1]
        for i in range(len(pkg_parts) + 1):
            f = _resolve_module(pkg_parts[:i], pkg_root)
            if f:
                seen.add(f)
    frontier = list(seen) if seen else [root_file]
    while frontier:
        f = frontier.pop()
        for dep in _direct_deps(f, pkg_root, pkg_name):
            if dep not in seen:
                seen.add(dep)
                frontier.append(dep)
    return sorted(seen)


def _closure_hash(root_file: str, pkg_root: str = _PKG_ROOT) -> str:
    key = (os.path.abspath(root_file), os.path.abspath(pkg_root))
    if key not in _CLOSURE_MEMO:
        h = hashlib.md5()
        for p in _import_closure(root_file, pkg_root):
            h.update(os.path.relpath(p, pkg_root).encode())
            try:
                with open(p, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                pass
        _CLOSURE_MEMO[key] = h.hexdigest()
    return _CLOSURE_MEMO[key]


def _const_repr(c, depth: int = 6) -> str:
    """Deterministic repr for a code constant or captured value. ``repr``
    of set/frozenset/dict follows iteration order, which varies with
    PYTHONHASHSEED -- that would give a different fingerprint every process
    (permanent cache miss AND prune of the valid entry each run). Sort
    set elements and dict items; recurse into containers (depth-capped
    against cycles). Array-likes contribute shape/dtype AND a content
    digest up to 16 MB -- a captured constant table whose VALUES change
    must change the fingerprint, or the stale executable with the old
    constants baked in would silently reload. Beyond the cap (big device
    arrays; params travel as jitted args, not captured bindings, so this
    is rare) content is skipped to avoid multi-GB hashing/transfers."""
    if hasattr(c, "shape") and hasattr(c, "dtype"):
        try:
            import numpy as _np
            nbytes = getattr(c, "nbytes", None)
            if nbytes is None:
                nbytes = int(_np.prod(c.shape or (1,))) * \
                    _np.dtype(c.dtype).itemsize
            if nbytes <= (1 << 24):
                a = _np.ascontiguousarray(_np.asarray(c))
                dig = hashlib.md5(a.tobytes()).hexdigest()[:16]
                return f"arr{c.shape}{c.dtype}:{dig}"
        except Exception:
            pass
        return f"arr{c.shape}{c.dtype}"
    if depth <= 0:
        return f"<depth:{type(c).__name__}>"
    if isinstance(c, (set, frozenset)):
        return ("set{" + ",".join(sorted(_const_repr(e, depth - 1)
                                         for e in c)) + "}")
    if isinstance(c, (tuple, list)):
        o, cl = ("(", ")") if isinstance(c, tuple) else ("[", "]")
        return o + ",".join(_const_repr(e, depth - 1) for e in c) + cl
    if isinstance(c, dict):
        items = sorted((_const_repr(k, depth - 1), _const_repr(v, depth - 1))
                       for k, v in c.items())
        return "{" + ",".join(f"{k}:{v}" for k, v in items) + "}"
    if c is Ellipsis or isinstance(c, (int, float, complex, str, bytes,
                                       bool, type(None))):
        return repr(c)
    # dataclass INSTANCES: field values are exactly what distinguishes one
    # config from another (a captured DPTHeadConfig(taps=2, act='exp') vs
    # act='inv_log' must fingerprint differently) and are deterministic --
    # hash type + per-field values
    import dataclasses as _dc
    if _dc.is_dataclass(c) and not isinstance(c, type):
        fields = ",".join(
            f"{f.name}={_const_repr(getattr(c, f.name), depth - 1)}"
            for f in _dc.fields(c))
        return (f"dc:{type(c).__module__}.{type(c).__qualname__}"
                f"({fields})")
    # other arbitrary objects: default repr embeds the memory address,
    # which is process-nondeterministic -- hash the type identity only
    # (structural changes to classes live in source files)
    return f"<{type(c).__module__}.{type(c).__qualname__}>"


def _scope_hash(fn: Optional[Callable]) -> str:
    """Source hash scoped to what ``fn`` can reach: the static import
    closure of its defining file, fn's own bytecode, the bytecode of every
    same-file function or partial it reaches through globals, closure
    cells or defaults (transitively, partial bound args included -- so
    editing a helper or constant next to the cached fn invalidates it even
    when the defining file lives outside the package, e.g. bench.py), and
    the shape/dtype, deterministic value or type identity of every other
    referenced binding. Falls back to the whole-package hash when the
    source can't be located (REPL, C ext)."""
    import functools
    import types

    src = None
    if fn is not None:
        try:
            src = inspect.getsourcefile(fn)
        except TypeError:
            src = None
    if src is None or not os.path.isfile(src):
        return _package_source_hash()
    src = os.path.abspath(src)
    h = hashlib.md5(_closure_hash(src).encode())
    seen_codes: Set[int] = set()
    to_visit: List[Callable] = []

    def is_same_file_fn(v):
        """A plain function defined in fn's own file: its bytecode is part
        of fn's effective source (package modules are covered by the
        import-closure hash; other-file functions contribute their
        module.qualname identity via hash_value)."""
        if not isinstance(v, types.FunctionType):
            return False
        try:
            vsrc = inspect.getsourcefile(v)
        except TypeError:
            return False
        return bool(vsrc) and os.path.abspath(vsrc) == src

    def hash_value(v):
        """Non-followed binding reachable from fn: hash what affects the
        traced program -- array-likes by shape/dtype, containers and
        primitives by (deterministic) value, foreign functions by
        identity. Class instances are left to the closure hash of the
        files defining them (a limitation for classes defined in an
        out-of-package root)."""
        if isinstance(v, (types.FunctionType, types.MethodType,
                          types.BuiltinFunctionType)):
            h.update(f"fn:{getattr(v, '__module__', '')}."
                     f"{getattr(v, '__qualname__', repr(type(v)))}".encode())
        elif isinstance(v, type):
            h.update(f"cls:{v.__module__}.{v.__qualname__}".encode())
        else:
            h.update(_const_repr(v).encode())

    def visit_value(v):
        """Route one reachable binding: partials and same-file functions
        are followed (bound args included); everything else value-hashes."""
        if isinstance(v, functools.partial) or is_same_file_fn(v):
            to_visit.append(v)
        else:
            hash_value(v)

    def hash_code(code, g):
        if id(code) in seen_codes:
            return
        seen_codes.add(id(code))
        h.update(code.co_code)
        h.update(repr(code.co_names).encode())
        for c in code.co_consts:       # literals + nested lambdas/defs
            if hasattr(c, "co_code"):
                hash_code(c, g)
            else:
                h.update(_const_repr(c).encode())
        # global references from this code object. Module refs are covered
        # by the import-closure hash; everything else (same-file helpers,
        # partials, CONSTANTS -- which for an out-of-package root like
        # bench.py appear in no hashed source) is followed or value-hashed.
        for name in code.co_names:
            if name in g and not isinstance(g[name], types.ModuleType):
                visit_value(g[name])

    def hash_fn(f):
        while isinstance(f, functools.partial):
            for a in f.args:
                visit_value(a)
            for k in sorted(f.keywords or {}):
                h.update(f"kw:{k}".encode())
                visit_value(f.keywords[k])
            f = f.func
        code = getattr(f, "__code__", None)
        if code is None:
            return
        hash_code(code, getattr(f, "__globals__", {}))
        for cell in (getattr(f, "__closure__", None) or ()):
            try:
                visit_value(cell.cell_contents)
            except ValueError:          # empty cell
                continue
        for v in (getattr(f, "__defaults__", None) or ()):
            visit_value(v)
        for k in sorted(getattr(f, "__kwdefaults__", None) or {}):
            h.update(f"kwdef:{k}".encode())
            visit_value(f.__kwdefaults__[k])

    if fn is not None:
        to_visit.append(fn)
    visited: Set[int] = set()
    while to_visit:
        f = to_visit.pop()
        if id(f) in visited:
            continue
        visited.add(id(f))
        hash_fn(f)
    return h.hexdigest()


def fingerprint(args: Sequence[Any], config: str = "",
                fn: Optional[Callable] = None) -> str:
    """12-hex-char key over reachable sources + config + arg shapes/dtypes.

    With ``fn`` given, "reachable" is fn's static import closure (so edits
    to unrelated modules keep entries valid); without it, the whole
    package."""
    h = hashlib.md5()
    h.update(_scope_hash(fn).encode())
    h.update(config.encode())
    for a in jax.tree_util.tree_leaves(args):
        h.update(f"{getattr(a, 'shape', ())}{getattr(a, 'dtype', '')}"
                 .encode())
    return h.hexdigest()[:12]


def load_or_compile(fn: Callable, args: Sequence[Any], *, name: str,
                    cache_dir: str, config: str = "",
                    donate_argnums=(), prune_stale: bool = True,
                    log: Optional[Callable[[str], None]] = None):
    """Return a compiled executable for ``jax.jit(fn)`` at ``args``.

    Loads ``<cache_dir>/aot_<name>_<fingerprint>.pkl`` when present;
    otherwise lowers + compiles, serializes the result for the next
    process, and (by default) prunes superseded entries for ``name``.
    Any load/serialize failure degrades to a plain compile.
    """
    from jax.experimental import serialize_executable as se

    def say(msg):
        if log:
            log(msg)

    fp = fingerprint(args, config, fn=fn)
    path = os.path.join(cache_dir, f"aot_{name}_{fp}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                n_dev, payload = pickle.load(fh)
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; a 1-device program loaded into an 8-device process
            # (virtual CPU mesh) then demands 8 input shards. Restore onto
            # the same device count it was compiled for.
            compiled = se.deserialize_and_load(
                *payload, execution_devices=jax.devices()[:n_dev])
            say(f"{name}: loaded AOT executable ({fp})")
            return compiled
        except Exception as e:
            say(f"{name}: AOT load failed ({type(e).__name__}: {e}); "
                f"recompiling")
    compiled = jax.jit(fn, donate_argnums=donate_argnums).lower(
        *args).compile()
    try:
        n_dev = len(compiled._executable.xla_executable.local_devices())
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump((n_dev, se.serialize(compiled)), fh)
        if prune_stale:
            # match the fingerprint suffix exactly: a bare aot_{name}_*
            # glob also matches LONGER names sharing the prefix (e.g.
            # 'bench_tea_hit' would delete 'bench_tea_hit_int8's valid
            # entry on every save, re-paying its ~340 s compile)
            import re
            pat = re.compile(
                rf"^aot_{re.escape(name)}_[0-9a-f]{{{len(fp)}}}\.pkl$")
            for stale in glob.glob(
                    os.path.join(cache_dir, f"aot_{name}_*.pkl")):
                if stale != path and pat.match(os.path.basename(stale)):
                    os.remove(stale)
        say(f"{name}: compiled + serialized AOT executable ({fp})")
    except Exception as e:
        say(f"{name}: AOT serialize failed ({type(e).__name__}: {e})")
    return compiled
