"""Structured CSV metrics logging — the observability layer of the eval suite
(the reference writes per-image and aggregate CSVs consumed by its plots and
BD scripts; modelseval.py:247-321)."""

from __future__ import annotations

import csv
import os
from typing import Sequence


class CsvLogger:
    def __init__(self, path: str, fieldnames: Sequence[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "w", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=self.fieldnames)
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
