"""Per-stage manifests: the persistence seam that makes the pipeline resumable.

Design mirrors ``SetSketchParams`` dump/reload (``setsketcher.rs:141-193``):
every stage directory carries a ``_manifest.json`` binding (config
fingerprint, upstream stage fingerprints, row counters, timestamps).  Resume
logic: a stage is reusable iff its manifest exists, status == complete, and
its config fingerprint chain matches the current run — otherwise it (and all
downstream stages) recompute.  Safe because every stage is a pure
deterministic function of (input table, config); see SURVEY.md §1.2.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

MANIFEST_NAME = "_manifest.json"


def stage_dir(root: str, stage: str) -> Path:
    return Path(root) / stage


def write_manifest(
    root: str, stage: str, fingerprint: str, counters: dict, extra: dict | None = None
) -> dict:
    d = stage_dir(root, stage)
    d.mkdir(parents=True, exist_ok=True)
    manifest = {
        "stage": stage,
        "status": "complete",
        "fingerprint": fingerprint,
        "counters": counters,
        "completed_at_unix": time.time(),
        **(extra or {}),
    }
    (d / MANIFEST_NAME).write_text(json.dumps(manifest, indent=2))
    return manifest


def read_manifest(root: str, stage: str) -> dict | None:
    p = stage_dir(root, stage) / MANIFEST_NAME
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except json.JSONDecodeError:
        return None


def stage_complete(root: str, stage: str, fingerprint: str) -> bool:
    m = read_manifest(root, stage)
    return (
        m is not None
        and m.get("status") == "complete"
        and m.get("fingerprint") == fingerprint
    )
