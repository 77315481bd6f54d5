"""Recursive size-bounded JSON splitter.

Models ``RAGFlowJsonParser`` (deepdoc/parser/json_parser.py:21-117, itself
langchain-derived per its header comment): lists are first converted to
index-keyed dicts, then the tree is packed into chunks whose serialized size
stays under ``max_chunk_size * 2`` (the constructor doubles it), starting a
new chunk only once the current one reaches ``min_chunk_size``.
"""

from __future__ import annotations

import json
from typing import Any

from ragflow_spark.core.codec import decode_bytes


class JsonSplitter:
    def __init__(self, max_chunk_size: int = 2000, min_chunk_size: int | None = None):
        self.max_chunk_size = max_chunk_size * 2
        self.min_chunk_size = (
            min_chunk_size
            if min_chunk_size is not None
            else max(max_chunk_size - 200, 50)
        )

    @staticmethod
    def _size(data: dict) -> int:
        return len(json.dumps(data, ensure_ascii=False))

    @staticmethod
    def _set_path(d: dict, path: list[str], value: Any) -> None:
        for key in path[:-1]:
            d = d.setdefault(key, {})
        d[path[-1]] = value

    def _listify(self, data: Any) -> Any:
        if isinstance(data, dict):
            return {k: self._listify(v) for k, v in data.items()}
        if isinstance(data, list):
            return {str(i): self._listify(v) for i, v in enumerate(data)}
        return data

    def _split(self, data: Any, path: list[str], chunks: list[dict]) -> list[dict]:
        if isinstance(data, dict):
            for key, value in data.items():
                new_path = path + [key]
                current = self._size(chunks[-1])
                item_size = self._size({key: value})
                if item_size < self.max_chunk_size - current:
                    self._set_path(chunks[-1], new_path, value)
                else:
                    if current >= self.min_chunk_size:
                        chunks.append({})
                    self._split(value, new_path, chunks)
        else:
            self._set_path(chunks[-1], path, data)
        return chunks

    def split_json(self, json_data: Any, convert_lists: bool = False) -> list[dict]:
        if convert_lists:
            json_data = self._listify(json_data)
        chunks = self._split(json_data, [], [{}])
        if chunks and not chunks[-1]:
            chunks.pop()
        return chunks

    def split_text_bytes(self, blob: bytes) -> list[str]:
        """The ``__call__`` path (json_parser.py:21-27): decode, parse, split
        with list conversion, serialize non-empty chunks."""
        txt = decode_bytes(blob)
        data = json.loads(txt)
        chunks = self.split_json(data, True)
        return [json.dumps(c, ensure_ascii=False) for c in chunks if c]
