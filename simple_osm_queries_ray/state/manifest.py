"""Per-partition checkpoint manifest for resumable index builds.

The reference import restarts from scratch on failure
(``/root/reference/src/importing/import.go:134-138``) even though its pass 3
is naturally per-extent resumable; the north rule requires real per-partition
checkpoints with lineage and metrics. The manifest is a JSON file next to the
index: one record per completed write wave with the partition ids, per
-partition row counts, input lineage (source dir + derivation params) and
wall-time metrics. A rerun skips every wave already recorded.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Manifest:
    path: str
    meta: dict[str, Any] = field(default_factory=dict)
    waves: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, index_dir: str, meta: dict[str, Any]) -> "Manifest":
        path = os.path.join(index_dir, "manifest.json")
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if data.get("meta") != meta:
                # lineage mismatch: different input or params -> restart clean
                return cls(path=path, meta=meta)
            return cls(path=path, meta=meta, waves=data.get("waves", {}))
        return cls(path=path, meta=meta)

    def is_done(self, wave_key: str) -> bool:
        return wave_key in self.waves

    def record(self, wave_key: str, partitions: dict[int, int], seconds: float) -> None:
        self.waves[wave_key] = {
            "partitions": {str(k): int(v) for k, v in partitions.items()},
            "rows": int(sum(partitions.values())),
            "seconds": round(seconds, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        self._flush()

    def _flush(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"meta": self.meta, "waves": self.waves}, f, indent=1)
        os.replace(tmp, self.path)

    def total_rows(self) -> int:
        return sum(w["rows"] for w in self.waves.values())
