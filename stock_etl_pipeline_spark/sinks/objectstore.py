"""Object-store commit arm for the snapshot-committed ACID table.

``sinks/acid.py`` routes every PROTOCOL filesystem operation — marker
create, snapshot publish, JSON metadata read/write, listing, delete —
through a pluggable ``CommitBackend`` (VERDICT r12 item 1). Data files
themselves are always read/written by Spark through whatever Hadoop
filesystem + committer the deployment uses; the backend only decides how
the COMMIT PROTOCOL maps onto the store's primitives. Two things differ
between a real filesystem and an object store:

1. **Atomic create-if-absent.** POSIX has ``O_CREAT|O_EXCL``; HDFS has
   an atomic ``FileSystem.createNewFile``. Object stores have a
   CONDITIONAL PUT — S3 ``If-None-Match: *`` (native since 2024), GCS
   ``x-goog-if-generation-match: 0``, Azure ``If-None-Match: *`` — which
   Hadoop's FileSystem API does not expose (S3A's createNewFile is a
   non-atomic HEAD-then-PUT). Deployments plug the store SDK call in via
   :func:`register_conditional_put`; it is the same primitive Iceberg's
   and Delta's object-store commit services are built on.
2. **No atomic rename.** Object-store "rename" is per-object
   server-side COPY + DELETE: not atomic, O(objects), and a crashed
   rename leaves a half-copied destination. The stage→rename publish
   sequence is therefore WRONG on an object store; ``acid.py`` switches
   (``CommitBackend.atomic_rename = False``) to a claim-first sequence —
   conditional-PUT the marker, write the snapshot's content directly at
   its final path, write ``_meta.json`` LAST. Each single PUT is atomic
   (an object is visible complete or not at all), so ``_meta.json``
   becomes the per-snapshot visibility bit and readers gate on it, never
   on directory existence (prefixes "exist" as soon as the first object
   under them lands).

:class:`SimulatedObjectStore` is the measurement + test harness: a
backend over a LOCAL directory that imposes object-store semantics on
the protocol — copy-based non-atomic rename (crash-injectable
mid-copy), complete-PUT-visible JSON writes (temp file + atomic rename
stands in for single-PUT atomicity), no directory primitives — and
counts every request by class (LIST calls with S3-style 1000-key
paging, HEAD, GET, PUT, COPY, DELETE, conditional PUT), so the
protocol's request-count growth (e.g. marker listing at 1k commits) is
measured in the store's native cost unit rather than local-disk
wall-clock. Its conditional PUT writes a temp object and ``os.link``s it
into place — atomic create-if-absent WITH body, POSIX atomicity standing
in for the SERVER-side guarantee of the real header; the simulation is
of everything AROUND the primitive, not of the primitive's own atomicity
(which the store contractually provides).

The reference pipeline's own warehouse is an object store + warehouse
pair (GCS upload + BigQuery MERGE, reference
``dags/utils/loaders.py:256-330``); this arm is what makes the ACID
table's 100 TB positioning hold on the storage its users actually run.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable

#: scheme -> callable(path, data: bytes) -> bool (True = created, False =
#: already exists). The callable performs the store's conditional PUT of
#: ``data`` (possibly empty) at ``path``, e.g. boto3
#: ``put_object(..., Body=data, IfNoneMatch="*")`` catching
#: ``PreconditionFailed``. Registered once per deployment. The body
#: matters: commit markers carry the claimant's uuid as the zombie-fencing
#: token the claim-first publish verifies.
_CONDITIONAL_PUTS: dict[str, Callable[[str, bytes], bool]] = {}


def register_conditional_put(
    scheme: str, fn: Callable[[str, bytes], bool]
) -> None:
    """Register the atomic create-if-absent primitive for an object-store
    scheme (``s3a``, ``gs``, ``abfs``...). Required before committing to
    an ACID table on that store — Hadoop's FileSystem API exposes no
    conditional PUT, and a non-atomic HEAD-then-PUT would reintroduce
    the double-claim race the commit protocol exists to prevent."""
    _CONDITIONAL_PUTS[scheme] = fn


def conditional_put_for(scheme: str) -> Callable[[str, bytes], bool] | None:
    return _CONDITIONAL_PUTS.get(scheme)


class SimulatedCrash(Exception):
    """Raised by fault injection mid-rename: the process 'died' with the
    destination half-copied."""


class SimulatedObjectStore:
    """Object-store-semantics CommitBackend over a local directory.

    Request counters (``.counts``) use the store's native cost classes:

    - ``list_calls`` / ``list_requests``: logical listings vs paged
      requests actually billed (S3 LIST returns ≤1000 keys per request).
    - ``head``, ``get``, ``put``, ``copy``, ``delete``,
      ``conditional_put``: per-object operations.

    ``fail_after_copies`` injects a crash after N object copies inside a
    rename — the half-copied destination is left in place, exactly what
    a process death mid-"rename" leaves on a real store.
    """

    name = "sim-objectstore"
    atomic_rename = False

    def __init__(self, *, page_size: int = 1000) -> None:
        self.page_size = page_size
        self.fail_after_copies: int | None = None
        self.counts = {
            "list_calls": 0, "list_requests": 0, "head": 0, "get": 0,
            "put": 0, "copy": 0, "delete": 0, "conditional_put": 0,
        }

    # -- path mapping ----------------------------------------------------
    @staticmethod
    def _local(path: str) -> str:
        if path.startswith("file:"):
            from urllib.parse import urlparse

            return urlparse(path).path
        return path

    # -- protocol operations ----------------------------------------------
    def exists(self, path: str) -> bool:
        self.counts["head"] += 1
        return os.path.exists(self._local(path))

    def mkdirs(self, path: str) -> None:
        # object stores have no directories; the local harness still needs
        # parents for O_EXCL/rename to land — not counted as a request
        os.makedirs(self._local(path), exist_ok=True)

    def list_names(self, path: str) -> list[str]:
        p = self._local(path)
        self.counts["list_calls"] += 1
        if not os.path.isdir(p):
            self.counts["list_requests"] += 1  # empty listing still bills
            return []
        names = sorted(os.listdir(p))
        self.counts["list_requests"] += max(
            1, -(-len(names) // self.page_size)
        )
        return names

    def delete(self, path: str, recursive: bool = False) -> bool:
        p = self._local(path)
        if not os.path.exists(p):
            return False
        if os.path.isdir(p):
            if not recursive:
                return False
            n = sum(len(fs) for _, _, fs in os.walk(p))
            self.counts["delete"] += n
            shutil.rmtree(p)
            return True
        self.counts["delete"] += 1
        os.remove(p)
        return True

    def read_json(self, path: str) -> dict:
        self.counts["get"] += 1
        with open(self._local(path), encoding="utf-8") as f:
            return json.load(f)

    def write_json(self, path: str, obj: dict) -> None:
        """Complete-PUT visibility: a reader sees the whole object or no
        object — never a partial write. Locally: temp file + atomic
        rename (the real store provides this per-PUT contractually)."""
        p = self._local(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.__put-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(obj, f)
        os.rename(tmp, p)
        self.counts["put"] += 1

    def atomic_create(self, path: str, data: bytes = b"") -> bool:
        """The conditional PUT (``If-None-Match: *``), body included —
        create-if-absent WITH content in one atomic step (a real PUT is
        all-or-nothing; locally: write a temp object, ``os.link`` it into
        place, which fails atomically when the target exists). POSIX
        atomicity stands in for the SERVER-side guarantee the real header
        provides; the simulation is of the protocol around the primitive,
        not of the primitive's own guarantee."""
        p = self._local(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        self.counts["conditional_put"] += 1
        # uuid, not id(data): interned payloads (notably b"") share ids
        # across same-process racers, and a shared temp name turns a lost
        # race into FileNotFoundError instead of False (code-review r13)
        tmp = f"{p}.__cput-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, p)
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
        return True

    def rename(self, src: str, dst: str) -> bool:
        """Per-object COPY + DELETE — NOT atomic: objects appear at the
        destination one by one, and a crash (``fail_after_copies``)
        leaves a half-copied destination plus the intact source. The
        commit protocol must never depend on this being atomic; under
        this backend acid.py only renames SINGLE data files (server-side
        copy on a real store) and never uses rename to publish."""
        s, d = self._local(src), self._local(dst)
        if not os.path.exists(s):
            return False
        if os.path.isfile(s):
            self._copy_object(s, d)
            self.counts["delete"] += 1
            os.remove(s)
            return True
        copied = []
        for root, _, names in os.walk(s):
            for n in sorted(names):
                sp = os.path.join(root, n)
                dp = os.path.join(d, os.path.relpath(sp, s))
                self._copy_object(sp, dp)
                copied.append(sp)
        self.counts["delete"] += len(copied)
        shutil.rmtree(s)
        return True

    def _copy_object(self, sp: str, dp: str) -> None:
        if (
            self.fail_after_copies is not None
            and self.counts["copy"] >= self.fail_after_copies
        ):
            raise SimulatedCrash(f"crashed mid-rename before copying {sp}")
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        # each single object copy IS atomic (server-side COPY): temp+rename
        tmp = f"{dp}.__copy-{os.getpid()}"
        shutil.copyfile(sp, tmp)
        os.rename(tmp, dp)
        self.counts["copy"] += 1
