"""Style DIRECTORY loading — the ``StyleFileLoader``/``StyleImpl`` /
``DirectoryFileLoader`` analogue (reference
``osmstyle/StyleFileLoader.java``, ``osmstyle/StyleImpl.java:81-120``,
``osmstyle/RuleFileReader.java:170-380``).

A style is a directory of files: ``version``, ``info``, ``options`` and
one rule file per element kind (``lines``, ``points``, ``polygons``,
``relations``), with three structural features the inline
``compile_style`` text form lacks:

- ``include 'file';`` (optionally ``from 'other-style'``) splices another
  file, resolved against the current style dir (or a sibling style under
  the common styles root) — recursive, cycle-checked
  (``RuleFileReader.readInclude``, java:329-380);
- ``if ( expr ) then ... [else ...] end`` blocks — the reference rewrites
  these into a synthetic-tag rule ``expr {set $if:N=true}`` plus a
  per-rule conjunct (``RuleFileReader.readIf``, java:216-246); this
  loader performs the same rewrite at text level, always using the safe
  synthetic tag (the reference falls back to it whenever an action could
  change the expression — using it unconditionally is behaviour-equal);
- ``<finalize>`` section markers splitting a rule file into main +
  finalize rule sets (``RuleFileReader.readFinalize``).

Everything resolves to plain rule text compiled by
``rules.compile_style`` — the loader is pure driver-side metadata work
(styles are KB-sized); only the compiled RuleSet ships to actors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

from .rules import RuleSet, compile_style

RULE_FILES = ("lines", "points", "polygons", "relations", "overlays")

_INCLUDE_RE = re.compile(
    r"^\s*include\s+(?:'([^']*)'|\"([^\"]*)\"|([^\s;=]+))"
    r"(?:\s+from\s+(?:'([^']*)'|\"([^\"]*)\"|([^\s;]+)))?\s*;?\s*(?:#.*)?$"
)
_IF_RE = re.compile(r"^\s*if\s*\((?P<expr>.*)\)\s*then\s*(?:#.*)?$")
_ELSE_RE = re.compile(r"^\s*else\s*(?:#.*)?$")
_END_RE = re.compile(r"^\s*end\s*(?:#.*)?$")
_FINALIZE_RE = re.compile(r"^\s*<\s*finalize\s*>\s*(?:#.*)?$")


class StyleDirLoader:
    """Opens files inside one style directory (``DirectoryFileLoader``)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"style directory not found: {root}")

    def open(self, filename: str) -> str:
        p = self.root / filename
        if not p.is_file():
            raise FileNotFoundError(f"{filename} not in style {self.root}")
        return p.read_text()

    def sibling(self, style_name: str) -> "StyleDirLoader":
        """Loader for ``include ... from 'style_name'`` — resolved
        against the parent directory holding all styles
        (``StyleFileLoader.createStyleLoader``)."""
        return StyleDirLoader(self.root.parent / style_name)

    def list(self) -> list[str]:
        """Style names under this directory: subdirs holding a
        ``version`` file, or this directory itself
        (``DirectoryFileLoader.list``)."""
        subs = sorted(
            p.name for p in self.root.iterdir()
            if p.is_dir() and (p / "version").is_file()
        )
        return subs or [self.root.name]


class StyleZipLoader:
    """Opens style files inside a zip archive — the ``JarFileLoader``
    analogue (jars ARE zips; ``osmstyle/JarFileLoader.java:36-120``).
    The style's entry prefix is found by searching the archive for
    ``version`` / ``<name>/version`` (``searchVersion``)."""

    def __init__(self, zip_path: str | Path, name: str | None = None,
                 prefix: str | None = None, _zf=None):
        import zipfile

        self.zip_path = Path(zip_path)
        self._zf = _zf or zipfile.ZipFile(self.zip_path)
        if prefix is not None:
            self.prefix = prefix
        else:
            self.prefix = self._search_version(name)
        # include-cycle key base, mirroring StyleDirLoader.root
        self.root = f"{self.zip_path}!{self.prefix}"

    def _search_version(self, name: str | None) -> str:
        flat_end = "version" if name is None else f"{name}/version"
        end = "/" + flat_end
        for ename in self._zf.namelist():
            if ename.endswith(end) or ename == flat_end:
                return ename[: len(ename) - len("version")]
        raise FileNotFoundError(
            f"style {name or ''} not found in {self.zip_path}"
        )

    def open(self, filename: str) -> str:
        path = self.prefix + filename
        try:
            return self._zf.read(path).decode("utf-8")
        except KeyError:
            raise FileNotFoundError(
                f"{filename} not in style zip {self.zip_path}"
            )

    def sibling(self, style_name: str) -> "StyleZipLoader":
        """``include ... from 'other'`` within the same archive: the
        sibling style lives next to this one under the common root."""
        parent = self.prefix.rstrip("/").rsplit("/", 1)
        root = parent[0] + "/" if len(parent) == 2 else ""
        return StyleZipLoader(
            self.zip_path, prefix=f"{root}{style_name}/", _zf=self._zf
        )

    def list(self) -> list[str]:
        """Names of all styles (dirs with a version entry) in the
        archive (``JarFileLoader.list``)."""
        out = []
        for ename in self._zf.namelist():
            if ename == "version":
                out.append(self.zip_path.stem)
            elif ename.endswith("/version"):
                out.append(ename[: -len("/version")].rsplit("/", 1)[-1])
        return sorted(set(out))


class CombinedStyleLoader:
    """A single ``.style`` file holding every style file between
    ``<<<filename>>>`` markers (``CombinedStyleFileLoader.java:
    40-75``)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.root = str(self.path)  # include-cycle key base
        self.files: dict[str, str] = {}
        current_name = None
        current: list[str] = []
        for line in self.path.read_text().splitlines():
            if line.startswith("<<<"):
                if current_name is not None:
                    self.files[current_name] = "\n".join(current) + "\n"
                current_name = re.sub(r">>>.*", "", line[3:]).strip()
                current = []
            else:
                current.append(line)
        if current_name is not None:
            self.files[current_name] = "\n".join(current) + "\n"

    def open(self, filename: str) -> str:
        if filename not in self.files:
            raise FileNotFoundError(f"{filename} not in {self.path}")
        return self.files[filename]

    def sibling(self, style_name: str):
        raise FileNotFoundError("no sub styles in a simple style file")

    def list(self) -> list[str]:
        return [self.path.stem]


def create_style_loader(loc: str | Path, name: str | None = None):
    """``StyleFileLoader.createStyleLoader`` dispatch (java:48-97):
    directory → :class:`StyleDirLoader` (descending into ``name`` when
    it names a sub-style), ``*.style`` file → combined single-file
    loader (no sub-styles), any other file → zip archive loader."""
    p = Path(loc)
    if p.is_dir():
        d = p
        if name is not None:
            sub = p / name
            if not sub.exists():
                raise FileNotFoundError(f"style {name} not found in {sub}")
            if sub.is_dir():
                d = sub
        return StyleDirLoader(d)
    if p.is_file():
        if p.suffix.lower() == ".style":
            if name is not None:
                raise FileNotFoundError(
                    "no sub styles in a simple style file"
                )
            return CombinedStyleLoader(p)
        return StyleZipLoader(p, name)
    raise FileNotFoundError(f"no such file or path: {loc}")


def resolve_includes(text: str, loader: StyleDirLoader,
                     _stack: tuple[str, ...] = ()) -> str:
    """Splice ``include`` lines recursively. A bare ``include=yes ...``
    rule never matches (the filename token cannot contain ``=``), exactly
    the keyword-vs-expression disambiguation of java:176-183."""
    out: list[str] = []
    for line in text.splitlines():
        m = _INCLUDE_RE.match(line)
        if not m:
            out.append(line)
            continue
        fname = m.group(1) or m.group(2) or m.group(3)
        from_style = m.group(4) or m.group(5) or m.group(6)
        sub_loader = loader.sibling(from_style) if from_style else loader
        key = f"{sub_loader.root}/{fname}"
        if key in _stack:
            raise ValueError(f"include cycle: {' -> '.join(_stack)} -> {key}")
        sub = sub_loader.open(fname)
        out.append(resolve_includes(sub, sub_loader, _stack + (key,)))
    return "\n".join(out)


def expand_if_blocks(text: str) -> str:
    """Rewrite ``if (expr) then / else / end`` blocks: emit the synthetic
    rule ``expr {set mkgmap:if:N=true}`` at the ``if`` line and prefix
    every enclosed rule with ``mkgmap:if:N=true &`` (negated for the
    else-branch). Nested blocks conjoin all enclosing frames."""
    out: list[str] = []
    stack: list[tuple[str, bool]] = []  # (var, in_else)
    n = 0
    for line in text.splitlines():
        m = _IF_RE.match(line)
        if m:
            n += 1
            var = f"mkgmap:if:{n}"
            expr = m.group("expr").strip()
            prefix = " & ".join(
                f"{v}{'!=' if neg else '='}true" for v, neg in stack
            )
            cond = f"({expr})" if not prefix else f"{prefix} & ({expr})"
            out.append(f"{cond} {{set {var}=true}}")
            stack.append((var, False))
            continue
        if _ELSE_RE.match(line):
            if not stack:
                raise ValueError("'else' without 'if'")
            var, in_else = stack.pop()
            if in_else:
                raise ValueError("duplicate 'else'")
            stack.append((var, True))
            continue
        if _END_RE.match(line):
            if not stack:
                raise ValueError("'end' without 'if'")
            stack.pop()
            continue
        stripped = line.strip()
        if stack and stripped and not stripped.startswith("#"):
            prefix = " & ".join(
                f"{v}{'!=' if neg else '='}true" for v, neg in stack
            )
            out.append(f"{prefix} & {line}")
        else:
            out.append(line)
    if stack:
        raise ValueError("unterminated 'if' block")
    return "\n".join(out)


def split_finalize(text: str) -> tuple[str, str]:
    """Split a rule file at its ``<finalize>`` marker (rules after it run
    in the finalize pass, e.g. housenumber post-processing)."""
    main: list[str] = []
    fin: list[str] = []
    cur = main
    for line in text.splitlines():
        if _FINALIZE_RE.match(line):
            if cur is fin:
                raise ValueError("duplicate <finalize> section")
            cur = fin
            continue
        cur.append(line)
    return "\n".join(main), "\n".join(fin)


def join_continuations(text: str) -> str:
    """Rule files may break one rule across physical lines; a rule is
    complete when parens/braces/brackets balance outside quotes (the
    reference tokenizer is newline-agnostic; compile_style is line-based,
    so the loader re-joins here)."""
    lines = text.splitlines()

    def delta(line: str) -> int:
        d = 0
        q = None
        for c in line:
            if q is not None:
                if c == q:
                    q = None
                continue
            if c in "'\"":
                q = c
            elif c == "#":
                break
            elif c in "({[":
                d += 1
            elif c in ")}]":
                d -= 1
        return d

    def continues(i: int) -> bool:
        """A balanced rule still continues if the next non-blank line
        starts with an action block or type clause."""
        for nxt in lines[i + 1 :]:
            s = nxt.strip()
            if not s or s.startswith("#"):
                continue
            return s[0] in "{["
        return False

    out: list[str] = []
    buf: list[str] = []
    depth = 0
    for i, line in enumerate(lines):
        depth += delta(line)
        buf.append(line)
        if depth > 0 or (buf[0].strip() and not buf[0].strip().startswith("#")
                         and continues(i)):
            continue
        out.append(" ".join(s.strip() for s in buf).strip()
                   if len(buf) > 1 else line)
        buf = []
        depth = 0
    if buf:
        out.append(" ".join(s.strip() for s in buf).strip())
    return "\n".join(out)


def parse_levels(value: str) -> list[tuple[int, int]]:
    """``0:24, 1:22, 2:20`` → [(0, 24), (1, 22), (2, 20)]."""
    pairs = []
    for part in value.split(","):
        part = part.strip()
        if not part:
            continue
        lvl, res = part.split(":")
        pairs.append((int(lvl), int(res)))
    return pairs


def parse_options(text: str) -> dict[str, str]:
    """``key = value`` lines, ``#`` comments (``StyleImpl`` reads these
    through the option-file reader)."""
    opts: dict[str, str] = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        k, v = line.split("=", 1)
        opts[k.strip()] = v.strip().strip("'\"")
    return opts


@dataclass
class StyleDef:
    """A fully resolved style (``StyleImpl`` analogue)."""

    name: str
    version: int
    info: dict[str, str] = field(default_factory=dict)
    options: dict[str, str] = field(default_factory=dict)
    levels: list[tuple[int, int]] = field(default_factory=list)
    overview_levels: list[tuple[int, int]] = field(default_factory=list)
    rule_text: dict[str, str] = field(default_factory=dict)
    finalize_text: dict[str, str] = field(default_factory=dict)

    def rules(self, kind: str) -> RuleSet:
        return compile_style(self.rule_text.get(kind, ""))

    def finalize_rules(self, kind: str) -> RuleSet:
        return compile_style(self.finalize_text.get(kind, ""))

    def used_tags(self) -> set[str]:
        """Union of every rule file's used-tag set plus the options
        ``extra-used-tags`` list (``StyleImpl.getUsedTags``,
        java:215-260) — what readers may prune every other tag column
        down to. Synthetic ``mkgmap:if:N`` tags are internal and
        excluded."""
        out: set[str] = set()
        for kind in self.rule_text:
            out |= self.rules(kind).used_tags()
            out |= self.finalize_rules(kind).used_tags()
        extra = self.options.get("extra-used-tags", "")
        out |= {t.strip() for t in extra.replace(",", " ").split()}
        out.discard("")
        return {t for t in out if not t.startswith("mkgmap:if:")}


def load_style(root: str | Path, name: str | None = None) -> StyleDef:
    """Load a style into a ``StyleDef``: mandatory ``version``
    (``StyleImpl.checkVersion``), optional ``info``/``options``, and each
    rule file passed through include-resolution → line-joining →
    if-expansion → finalize-split. ``root`` may be a style directory, a
    zip archive of styles, or a combined ``.style`` file
    (``create_style_loader`` dispatch)."""
    loader = create_style_loader(root, name)
    try:
        version = int(loader.open("version").split()[0])
    except FileNotFoundError:
        raise FileNotFoundError(
            f"not a style directory (no version file): {root}"
        )
    info: dict[str, str] = {}
    options: dict[str, str] = {}
    try:
        info = parse_options(loader.open("info"))
    except FileNotFoundError:
        pass
    try:
        options = parse_options(loader.open("options"))
    except FileNotFoundError:
        pass
    sd = StyleDef(
        name=name or Path(root).name,
        version=version,
        info=info,
        options=options,
        levels=parse_levels(options.get("levels", "")),
        overview_levels=parse_levels(options.get("overview-levels", "")),
    )
    for kind in RULE_FILES:
        try:
            raw = loader.open(kind)
        except FileNotFoundError:
            continue
        resolved = expand_if_blocks(
            join_continuations(resolve_includes(raw, loader))
        )
        main, fin = split_finalize(resolved)
        sd.rule_text[kind] = main
        sd.finalize_text[kind] = fin
    return sd
