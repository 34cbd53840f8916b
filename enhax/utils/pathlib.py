"""Path subclass with file-type predicates and dir helpers.

Rebuild of the reference's ``core/pathlib.py:48-583`` (``Path`` with
``is_image_file``/``is_config_file``/… predicates, dir listing, copy/delete
helpers). Same surface, host-side, no torch.
"""

from __future__ import annotations

import pathlib
import shutil

from enhax.constants import CONFIG_EXTS, IMAGE_EXTS, VIDEO_EXTS, WEIGHTS_EXTS


class Path(type(pathlib.Path())):  # platform-correct concrete base
    """``pathlib.Path`` with file-type predicates (reference core/pathlib.py:48)."""

    # -- predicates ---------------------------------------------------------

    def is_image_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() in IMAGE_EXTS and (not exist or self.is_file())

    def is_video_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() in VIDEO_EXTS and (not exist or self.is_file())

    def is_config_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() in CONFIG_EXTS and (not exist or self.is_file())

    def is_weights_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() in WEIGHTS_EXTS and (not exist or self.is_file())

    def is_py_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() == ".py" and (not exist or self.is_file())

    def is_json_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() == ".json" and (not exist or self.is_file())

    def is_yaml_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() in (".yaml", ".yml") and (not exist or self.is_file())

    def is_txt_file(self, exist: bool = True) -> bool:
        return self.suffix.lower() == ".txt" and (not exist or self.is_file())

    def has_subdir(self, name: str) -> bool:
        return name in [d.name for d in self.subdirs()]

    # -- listing -------------------------------------------------------------

    def subdirs(self, recursive: bool = False) -> list["Path"]:
        it = self.rglob("*") if recursive else self.glob("*")
        return [Path(p) for p in it if p.is_dir()]

    def files(self, recursive: bool = False) -> list["Path"]:
        it = self.rglob("*") if recursive else self.glob("*")
        return [Path(p) for p in it if p.is_file()]

    def image_files(self, recursive: bool = True) -> list["Path"]:
        return sorted(f for f in self.files(recursive) if f.is_image_file())

    def latest_file(self) -> "Path | None":
        files = self.files()
        return max(files, key=lambda f: f.stat().st_mtime) if files else None

    # -- mutation helpers ----------------------------------------------------

    def copy_to(self, dst: "Path | str", replace: bool = True) -> "Path":
        """Copy this file to ``dst`` (dir or full path). reference pathlib.py:455."""
        dst = Path(dst)
        if dst.is_dir() or dst.suffix == "":
            dst.mkdir(parents=True, exist_ok=True)
            dst = dst / self.name
        else:
            dst.parent.mkdir(parents=True, exist_ok=True)
        if dst.exists() and not replace:
            return dst
        shutil.copyfile(self, dst)
        return dst

    def delete(self, missing_ok: bool = True) -> None:
        if self.is_dir():
            shutil.rmtree(self, ignore_errors=missing_ok)
        else:
            self.unlink(missing_ok=missing_ok)

    def delete_cache(self) -> None:
        """Remove ``__pycache__``/``.cache`` dirs below (reference pathlib.py:470)."""
        for d in self.rglob("__pycache__"):
            shutil.rmtree(d, ignore_errors=True)
        for d in self.rglob(".cache"):
            shutil.rmtree(d, ignore_errors=True)
