"""File IO backend abstraction (reference: basicsr/utils/file_client.py:167).

Disk and memcached/lmdb-style backends behind one interface. The lmdb and
memcached client libraries are not in this image, so those backends raise a
clear ImportError at construction (they activate when the packages are
installed); the disk backend is complete.
"""

from __future__ import annotations


class BaseStorageBackend:
    def get(self, filepath):
        raise NotImplementedError


class HardDiskBackend(BaseStorageBackend):
    def get(self, filepath):
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath):
        with open(filepath, "r") as f:
            return f.read()


class _PackDb:
    """Reader for the portable `.lmdb` fallback layout written by
    lmdb_util.LmdbMaker when the lmdb package is absent:
    `data.pack` (concatenated values) + `index.txt` (key\\toffset\\tlength)."""

    def __init__(self, db_path):
        import mmap

        index_path = f"{db_path}/index.txt"
        self._index = {}
        with open(index_path) as f:
            for line in f:
                key, off, length = line.rstrip("\n").split("\t")
                self._index[key] = (int(off), int(length))
        self._f = open(f"{db_path}/data.pack", "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)

    def get(self, key):
        if key not in self._index:
            return None
        off, length = self._index[key]
        return self._mm[off : off + length]


class LmdbBackend(BaseStorageBackend):
    """lmdb backend (reference: file_client.py LmdbBackend).

    Uses the `lmdb` package for standard data.mdb databases; `.lmdb`
    directories built by lmdb_util's fallback writer (data.pack) are read
    without it. A db is opened per client_key, matching the reference's
    multi-db interface.
    """

    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False,
                 readahead=False, **kwargs):
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        import os.path as osp

        self._client = {}
        for k, p in zip(client_keys, db_paths):
            if osp.exists(osp.join(p, "data.pack")):
                self._client[k] = _PackDb(p)
            else:
                try:
                    import lmdb
                except ImportError as e:
                    raise ImportError(
                        f"{p} is a standard lmdb database; reading it requires "
                        "the `lmdb` package"
                    ) from e
                self._client[k] = lmdb.open(
                    p, readonly=readonly, lock=lock, readahead=readahead, **kwargs
                )

    def get(self, filepath, client_key="default"):
        client = self._client[client_key]
        if isinstance(client, _PackDb):
            return client.get(str(filepath))
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend(BaseStorageBackend):
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise ImportError("memcached backend requires mc/pymemcache packages")


class FileClient:
    """Dispatch by backend name (reference: file_client.py FileClient)."""

    _backends = {
        "disk": HardDiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} not supported. Supported: {list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)


def imfrombytes(content, flag="color", float32=False):
    """Decode image bytes (reference: img_util.imfrombytes)."""
    import cv2
    import numpy as np

    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype("float32") / 255.0
    return img
