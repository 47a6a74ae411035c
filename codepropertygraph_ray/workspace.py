"""Workspace + script management — the console layer analog.

Rebuild of the reference's project/workspace handling
(`console/src/main/scala/io/shiftleft/console/workspacehandling/
WorkspaceManager.scala:30-120`: a workspace directory holds named
projects, each a `project.json` descriptor + the stored graph;
createProject overwrites an existing name, open loads the stored graph)
and its script runner (`console/.../scripting/ScriptManager.scala:41-108`:
discover scripts in a directory, run one against a loaded CPG with
parameters).

Transposition: a *project* pairs an input corpus dir (``sf_dir``) with a
pass-ledger output dir (the overlay store). "Open" re-attaches a
``PipelineRunner`` over the stored ledger — the resume semantics the
pass framework already provides — so opening is cheap and the graph
tables stream through the normal delta reads. Scripts are plain Python
files executed with ``graph`` (a GraphView), ``runner`` and ``params``
in scope; the script's ``result`` variable is returned (the Ammonite
`runScript` contract without an embedded compiler).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

PROJECT_FILE = "project.json"
GRAPH_DIR = "graph"


@dataclass(frozen=True)
class Project:
    name: str
    sf_dir: str
    path: str  # workspace/<name>

    @property
    def graph_dir(self) -> str:
        return os.path.join(self.path, GRAPH_DIR)


class WorkspaceManager:
    """Loads and maintains the list of projects under one workspace dir."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._active: str | None = None

    # -- project lifecycle --------------------------------------------------

    def create_project(self, sf_dir: str, name: str | None = None,
                       build: bool = True) -> Project:
        """Register (and by default build) a project for ``sf_dir``.

        Mirrors `WorkspaceManager.createProject`: a missing input is an
        error; an existing project of the same name is overwritten."""
        if not os.path.isdir(sf_dir):
            raise FileNotFoundError(f"no input at {sf_dir!r}")
        name = name or os.path.basename(os.path.normpath(sf_dir))
        if self.project(name) is not None:
            self.remove_project(name)
        pdir = os.path.join(self.path, name)
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, PROJECT_FILE), "w", encoding="utf-8") as fh:
            json.dump({"name": name, "inputPath": os.path.abspath(sf_dir)}, fh)
        proj = Project(name, os.path.abspath(sf_dir), pdir)
        if build:
            self.open(name)  # first open builds via the pass ledger
        self._active = name
        return proj

    def remove_project(self, name: str) -> None:
        pdir = os.path.join(self.path, name)
        if not os.path.isfile(os.path.join(pdir, PROJECT_FILE)):
            raise KeyError(f"no project {name!r} in workspace {self.path}")
        shutil.rmtree(pdir)
        if self._active == name:
            self._active = None

    def projects(self) -> list[Project]:
        out = []
        for entry in sorted(os.listdir(self.path)):
            pf = os.path.join(self.path, entry, PROJECT_FILE)
            if os.path.isfile(pf):
                meta = json.load(open(pf, encoding="utf-8"))
                out.append(Project(meta["name"], meta["inputPath"],
                                   os.path.join(self.path, entry)))
        return out

    def project(self, name: str) -> Project | None:
        return next((p for p in self.projects() if p.name == name), None)

    def open(self, name: str):
        """Project → PipelineRunner over its stored ledger (build-or-resume,
        the `openProject`/CpgLoader analog)."""
        proj = self.project(name)
        if proj is None:
            raise KeyError(f"no project {name!r} in workspace {self.path}")
        from .pipelines.kg import build_kg

        runner = build_kg(proj.sf_dir, proj.graph_dir)
        self._active = name
        return runner

    @property
    def active(self) -> str | None:
        return self._active


# ---------------------------------------------------------------------------
# script management (ScriptManager.scala:41-108 analog)
# ---------------------------------------------------------------------------


def list_scripts(scripts_dir: str) -> list[tuple[str, str]]:
    """(name, description) per ``*.py`` under ``scripts_dir`` (recursive) —
    the description is the script's first docstring line (plays the role
    of `scripts.json`)."""
    import ast

    out = []
    for root, _dirs, files in os.walk(scripts_dir):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, scripts_dir)
            try:
                doc = ast.get_docstring(ast.parse(open(path, encoding="utf-8").read()))
            except SyntaxError:
                doc = None
            out.append((rel, (doc or "").splitlines()[0] if doc else ""))
    return sorted(out)


def run_script(script_path: str, runner, params: dict | None = None):
    """Execute a Python script against an open project.

    In scope for the script: ``graph`` (a GraphView over the project's
    materialized tables), ``runner`` (the PipelineRunner), ``params``
    (string map, the reference's script parameters). The script's
    ``result`` binding is returned."""
    from .traversal import GraphView

    src = open(script_path, encoding="utf-8").read()
    ns: dict = {
        "graph": GraphView.from_runner(runner),
        "runner": runner,
        "params": dict(params or {}),
    }
    code = compile(src, script_path, "exec")
    exec(code, ns)  # noqa: S102 — the script IS user code, like Ammonite's
    return ns.get("result")
