from .txt import read_ic_txt, write_snapshot_txt, save_path
from .checkpoint import save_npz, load_npz

__all__ = ["read_ic_txt", "write_snapshot_txt", "save_path", "save_npz", "load_npz"]
