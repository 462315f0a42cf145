"""Index table storage, build manifest and checkpoint/resume.

Storage layout (one directory per index — the Spark analogue of the
reference's 4 mmap files, engine/src/lib.rs:120-156):

    <index_dir>/
      turns/         row store: one row per turn (≈ RkyvStorage,
                     storage/src/store.rs:186-273)
      term_dict/     (term, term_id, df, cf)   (≈ frozen TermMap MPH,
                     engine/src/term_map.rs:75-85)
      postings/      uncompressed postings, hive-partitioned by bucket
                     (≈ MultiStorage, storage/src/store.rs:102-184)
      blocks/        delta+varint-compressed posting blocks with
                     block-max metadata, partitioned by bucket
      stats.json     N, total_dl, avgdl, n_terms  (global aggregates)
      _manifest.jsonl  per-stage/per-chunk lineage + metrics; the
                     checkpoint log that makes the build resumable

The table format is an abstraction point: when an Iceberg runtime jar is
on the classpath we would commit these as Iceberg tables (snapshot commit
= persist, engine/src/lib.rs:120-156); this sandbox has no Iceberg jar, so
the local implementation is hive-partitioned Parquet plus an explicit
manifest — the layout (bucket partitioning, sorted files, min/max
data-skipping) is format-independent.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

MANIFEST = "_manifest.jsonl"


@dataclass
class Manifest:
    """Append-only build log: each committed entry is a checkpoint."""

    index_dir: str
    entries: list[dict] = field(default_factory=list)

    @property
    def path(self) -> str:
        return os.path.join(self.index_dir, MANIFEST)

    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        m = cls(index_dir)
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.entries = [json.loads(line) for line in f if line.strip()]
        return m

    def is_done(self, stage: str, unit: str = "*") -> bool:
        return any(
            e["stage"] == stage and e["unit"] == unit and e["status"] == "done"
            for e in self.entries
        )

    def commit(self, stage: str, unit: str = "*", **metrics: Any) -> dict:
        entry = {
            "stage": stage,
            "unit": unit,
            "status": "done",
            "wall_ts": time.time(),
            **metrics,
        }
        os.makedirs(self.index_dir, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        self.entries.append(entry)
        return entry


def table_path(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def write_stats(index_dir: str, stats: dict) -> None:
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total
