"""Host-side video I/O over OpenCV and ffmpeg.

Rebuild of reference ``core/video/io.py``: VideoLoaderCV (:138) frame
streaming, VideoWriterCV (:196), and VideoWriterFFmpeg (:317) — the latter
as a raw subprocess pipe (rawvideo rgb24 in -> encoder out) instead of the
ffmpeg-python wrapper, for codecs/containers beyond cv2's support. Frames
are RGB HWC numpy on the host.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class VideoReaderCV:
    """Stream RGB frames from a video file (reference VideoLoaderCV)."""

    def __init__(self, path, to_float: bool = True):
        import cv2
        self.path = str(path)
        self.cap = cv2.VideoCapture(self.path)
        if not self.cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.to_float = to_float
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.index = 0

    def __len__(self) -> int:
        return max(self.frame_count, 0)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        import cv2
        ok, frame = self.cap.read()
        if not ok:
            self.cap.release()
            raise StopIteration
        self.index += 1
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if self.to_float:
            frame = frame.astype(np.float32) / 255.0
        return frame

    def close(self):
        self.cap.release()


class VideoWriterCV:
    """Write RGB frames to a video file (reference VideoWriterCV io.py:196)."""

    def __init__(self, path, fps: float = 30.0, size: tuple[int, int] | None = None,
                 fourcc: str = "mp4v"):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.fps = fps
        self.size = size  # (h, w)
        self.fourcc = fourcc
        self.writer = None

    def _ensure(self, frame):
        import cv2
        if self.writer is None:
            h, w = (self.size if self.size else frame.shape[:2])
            self.size = (h, w)
            self.writer = cv2.VideoWriter(
                str(self.path), cv2.VideoWriter_fourcc(*self.fourcc), self.fps, (w, h)
            )

    def write(self, frame) -> None:
        import cv2
        frame = np.asarray(frame)
        if frame.dtype in (np.float32, np.float64, np.float16):
            frame = np.clip(frame * 255.0 + 0.5, 0, 255).astype(np.uint8)
        self._ensure(frame)
        if frame.shape[:2] != self.size:
            frame = cv2.resize(frame, (self.size[1], self.size[0]))
        self.writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def write_batch(self, frames) -> None:
        for f in frames:
            self.write(f)

    def close(self):
        if self.writer is not None:
            self.writer.release()
            self.writer = None


def is_ffmpeg_available(binary: str = "ffmpeg") -> bool:
    import shutil
    return shutil.which(binary) is not None


class VideoWriterFFmpeg:
    """Pipe RGB frames into an ffmpeg encoder subprocess.

    Rebuild of reference ``core/video/io.py:317 VideoWriterFFmpeg``: frames
    enter as rawvideo rgb24 over stdin; ffmpeg encodes to ``pix_fmt``
    (default yuv420p) at ``fps``, overwriting the destination. Extra
    ``ffmpeg_args`` are passed to the output verbatim (the reference passes
    kwargs to ffmpeg-python the same way). Lazily sizes from the first
    frame like VideoWriterCV.
    """

    def __init__(self, path, fps: float = 30.0,
                 size: tuple[int, int] | None = None,
                 pix_fmt: str = "yuv420p", codec: str | None = None,
                 binary: str = "ffmpeg", extra_args: tuple = (),
                 verbose: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.fps = fps
        self.size = size  # (h, w)
        self.pix_fmt = pix_fmt
        self.codec = codec
        self.binary = binary
        self.extra_args = tuple(extra_args)
        self.verbose = verbose
        self.proc = None
        self._stderr_thread = None
        self._stderr_tail = []

    def _ensure(self, frame):
        import subprocess
        if self.proc is not None:
            return
        if not is_ffmpeg_available(self.binary):
            raise RuntimeError(
                f"{self.binary!r} not found on PATH; use VideoWriterCV or "
                "install ffmpeg")
        h, w = (self.size if self.size else frame.shape[:2])
        self.size = (h, w)
        cmd = [self.binary, "-y",
               "-f", "rawvideo", "-pix_fmt", "rgb24",
               "-s", f"{w}x{h}", "-r", str(self.fps), "-i", "pipe:"]
        if not self.verbose:
            # "error" (not "quiet"): encoder failures must reach stderr so
            # write()/close() can surface them instead of a bare BrokenPipe
            cmd += ["-loglevel", "error"]
        if self.codec:
            cmd += ["-c:v", self.codec]
        cmd += ["-pix_fmt", self.pix_fmt]
        if self.pix_fmt == "yuv420p" and (h % 2 or w % 2):
            # 4:2:0 needs even dims (VideoWriterCV handled odd sizes); pad
            # one edge pixel rather than rejecting the stream
            cmd += ["-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2"]
        cmd += [*self.extra_args, str(self.path)]
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                     stderr=subprocess.PIPE)
        # drain stderr on a thread: an undrained pipe fills after ~64KB of
        # encoder chatter and deadlocks ffmpeg against stdin.write
        import collections
        import threading
        self._stderr_tail = collections.deque(maxlen=64)

        def _drain(stream, tail):
            for line in iter(stream.readline, b""):
                tail.append(line)

        self._stderr_thread = threading.Thread(
            target=_drain, args=(self.proc.stderr, self._stderr_tail),
            daemon=True)
        self._stderr_thread.start()

    def _fail(self, action: str):
        rc = self.proc.poll()
        if self._stderr_thread is not None:
            self._stderr_thread.join(timeout=2.0)
        err = b"".join(self._stderr_tail)
        self.proc = None
        raise RuntimeError(
            f"ffmpeg {action} {self.path} failed (exit {rc}): "
            f"{err.decode(errors='replace').strip()[-500:]}")

    def write(self, frame) -> None:
        frame = np.asarray(frame)
        if frame.dtype in (np.float32, np.float64, np.float16):
            frame = np.clip(frame * 255.0 + 0.5, 0, 255).astype(np.uint8)
        frame = np.ascontiguousarray(frame)
        self._ensure(frame)
        if frame.shape[:2] != self.size:
            import cv2
            frame = cv2.resize(frame, (self.size[1], self.size[0]))
        try:
            self.proc.stdin.write(frame.tobytes())
        except (BrokenPipeError, OSError):
            self._fail("encoding to")

    def write_batch(self, frames) -> None:
        for f in frames:
            self.write(f)

    def close(self):
        if self.proc is not None:
            try:
                self.proc.stdin.close()
            except OSError:
                pass
            rc = self.proc.wait()
            if rc != 0:
                self._fail("finalizing")
            self.proc = None


def make_video_writer(path, fps: float = 30.0, size=None,
                      prefer: str = "auto", **kwargs):
    """``prefer='auto'``: ffmpeg pipe when the binary exists (broader codec
    and container support), else cv2. ``'ffmpeg'``/``'cv2'`` force a path.
    Mirrors the reference's writer selection (core/video/io.py:196,317)."""
    if prefer == "ffmpeg" or (prefer == "auto" and is_ffmpeg_available()):
        return VideoWriterFFmpeg(path, fps=fps, size=size, **kwargs)
    return VideoWriterCV(path, fps=fps, size=size)
