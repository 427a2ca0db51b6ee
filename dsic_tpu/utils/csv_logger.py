"""Structured CSV metrics logging — the observability layer of the eval suite
(the reference writes per-image and aggregate CSVs consumed by its plots and
BD scripts; modelseval.py:247-321)."""

from __future__ import annotations

import csv
import os
from typing import Sequence


class CsvLogger:
    def __init__(self, path: str, fieldnames: Sequence[str],
                 append: bool = False):
        """``append=True`` keeps an existing file's rows (resumed training
        runs continue their log instead of truncating the history)."""
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        existing = append and os.path.exists(path) and os.path.getsize(path)
        self._fh = open(path, "a" if append else "w", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=self.fieldnames)
        if not existing:
            self._writer.writeheader()

    def log(self, **row):
        self._writer.writerow({k: row.get(k, "") for k in self.fieldnames})
        self._fh.flush()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
