"""LMDB dataset builder (reference: basicsr/utils/lmdb_util.py).

Builds the reference's `.lmdb` dataset layout:

    example.lmdb
    ├── data.mdb + lock.mdb    (standard lmdb files, written via the `lmdb`
    │                           package when it is installed)
    ├── data.pack + index.txt  (portable fallback written when the `lmdb`
    │                           package is absent, as in this image)
    └── meta_info.txt          (one line per image: `key.png (h,w,c) <cl>`)

Keys are image names without extension; values are cv2 png-encoded bytes at
`compress_level` — byte-identical semantics to the reference builder. The
fallback pack is a flat concatenation of the value bytes plus a
`key\\toffset\\tlength` index; `file_client.LmdbBackend` reads either layout
transparently, so datasets built with the fallback keep working after the
real lmdb package is installed (and vice versa: real data.mdb files are
read with the package).
"""

from __future__ import annotations

import os
import os.path as osp

import cv2

try:  # the real thing when available
    import lmdb as _lmdb
except ImportError:  # pragma: no cover - exercised in images with lmdb
    _lmdb = None


def read_img_worker(path, key, compress_level):
    """Read + png-encode one image (reference: lmdb_util.py:132-153)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    _, img_byte = cv2.imencode(
        ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
    )
    return key, img_byte.tobytes(), (h, w, c)


class LmdbMaker:
    """Incremental lmdb writer (reference: lmdb_util.py:156-198)."""

    def __init__(self, lmdb_path, map_size=1024 ** 4, batch=5000, compress_level=1):
        if not lmdb_path.endswith(".lmdb"):
            raise ValueError("lmdb_path must end with '.lmdb'")
        if osp.exists(lmdb_path):
            raise FileExistsError(f"Folder {lmdb_path} already exists.")
        os.makedirs(lmdb_path)
        self.lmdb_path = lmdb_path
        self.batch = batch
        self.compress_level = compress_level
        self.counter = 0
        self.txt_file = open(osp.join(lmdb_path, "meta_info.txt"), "w")
        if _lmdb is not None:
            self.env = _lmdb.open(lmdb_path, map_size=map_size)
            self.txn = self.env.begin(write=True)
            self.pack = None
        else:
            self.env = None
            self.pack = open(osp.join(lmdb_path, "data.pack"), "wb")
            self.index = open(osp.join(lmdb_path, "index.txt"), "w")
            self.offset = 0

    def put(self, img_byte, key, img_shape):
        self.counter += 1
        if self.env is not None:
            self.txn.put(key.encode("ascii"), img_byte)
            if self.counter % self.batch == 0:
                self.txn.commit()
                self.txn = self.env.begin(write=True)
        else:
            self.pack.write(img_byte)
            self.index.write(f"{key}\t{self.offset}\t{len(img_byte)}\n")
            self.offset += len(img_byte)
        h, w, c = img_shape
        self.txt_file.write(f"{key}.png ({h},{w},{c}) {self.compress_level}\n")

    def close(self):
        if self.env is not None:
            self.txn.commit()
            self.env.close()
        else:
            self.pack.close()
            self.index.close()
        self.txt_file.close()


def make_lmdb_from_imgs(
    data_path,
    lmdb_path,
    img_path_list,
    keys,
    batch=5000,
    compress_level=1,
    multiprocessing_read=False,
    n_thread=40,
    map_size=None,
):
    """Make an lmdb dataset from images (reference: lmdb_util.py:9-129).

    Args mirror the reference exactly; `img_path_list` entries are relative
    to `data_path`, `keys` are the lmdb keys (image names w/o extension).
    `multiprocessing_read` pre-reads all images with a process pool.
    """
    assert len(img_path_list) == len(keys), (
        f"img_path_list and keys should have the same length, "
        f"but got {len(img_path_list)} and {len(keys)}"
    )
    print(f"Create lmdb for {data_path}, save to {lmdb_path}...")
    print(f"Total images: {len(img_path_list)}")
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if osp.exists(lmdb_path):
        raise FileExistsError(f"Folder {lmdb_path} already exists. Exit.")

    dataset = {}
    shapes = {}
    if multiprocessing_read:
        from multiprocessing import Pool

        with Pool(processes=n_thread) as pool:
            results = [
                pool.apply_async(
                    read_img_worker,
                    (osp.join(data_path, path), key, compress_level),
                )
                for path, key in zip(img_path_list, keys)
            ]
            for r in results:
                key, img_byte, shape = r.get()
                dataset[key] = img_byte
                shapes[key] = shape

    if map_size is None and _lmdb is not None:
        # estimate from the first image
        _, first_byte, _ = read_img_worker(
            osp.join(data_path, img_path_list[0]), keys[0], compress_level
        )
        map_size = len(first_byte) * len(img_path_list) * 10

    maker = LmdbMaker(
        lmdb_path, map_size=map_size or 1024 ** 4, batch=batch,
        compress_level=compress_level,
    )
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        if multiprocessing_read:
            img_byte, shape = dataset[key], shapes[key]
        else:
            _, img_byte, shape = read_img_worker(
                osp.join(data_path, path), key, compress_level
            )
        maker.put(img_byte, key, shape)
    maker.close()
    print("Finish writing lmdb.")
