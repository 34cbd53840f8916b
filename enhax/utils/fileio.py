"""Extension-keyed serializer registry.

Rebuild of the reference's ``core/file/`` handlers (base.py:28 +
json.py/yaml.py/pickle.py/xml.py registrations): one ``FileHandler`` ABC,
registered per extension, plus ``load_file``/``dump_file`` dispatchers.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any

from enhax.constants import FILE_HANDLERS


class FileHandler:
    """Serializer interface (reference core/file/base.py:28)."""

    def load(self, path, **kwargs) -> Any:
        raise NotImplementedError

    def dump(self, obj, path, **kwargs) -> None:
        raise NotImplementedError


@FILE_HANDLERS.register(name=".json", aliases=["json"])
class JSONHandler(FileHandler):
    def load(self, path, **kwargs):
        with open(path, "r") as f:
            return json.load(f, **kwargs)

    def dump(self, obj, path, **kwargs):
        kwargs.setdefault("indent", 2)
        kwargs.setdefault("default", str)
        with open(path, "w") as f:
            json.dump(obj, f, **kwargs)


@FILE_HANDLERS.register(name=".yaml", aliases=["yaml", ".yml", "yml"])
class YAMLHandler(FileHandler):
    def load(self, path, **kwargs):
        import yaml
        with open(path, "r") as f:
            return yaml.safe_load(f, **kwargs)

    def dump(self, obj, path, **kwargs):
        import yaml
        kwargs.setdefault("default_flow_style", False)
        with open(path, "w") as f:
            yaml.safe_dump(obj, f, **kwargs)


@FILE_HANDLERS.register(name=".pkl", aliases=["pickle", ".pickle"])
class PickleHandler(FileHandler):
    def load(self, path, **kwargs):
        with open(path, "rb") as f:
            return pickle.load(f, **kwargs)

    def dump(self, obj, path, **kwargs):
        with open(path, "wb") as f:
            pickle.dump(obj, f, **kwargs)


@FILE_HANDLERS.register(name=".xml", aliases=["xml"])
class XMLHandler(FileHandler):
    def load(self, path, **kwargs):
        import xml.etree.ElementTree as ET

        def node_to_dict(node):
            d = dict(node.attrib)
            for child in node:
                cd = node_to_dict(child)
                if child.tag in d:
                    prev = d[child.tag]
                    d[child.tag] = prev + [cd] if isinstance(prev, list) else [prev, cd]
                else:
                    d[child.tag] = cd
            text = (node.text or "").strip()
            if text and not d:
                return text
            if text:
                d["_text"] = text
            return d

        root = ET.parse(path).getroot()
        return {root.tag: node_to_dict(root)}

    def dump(self, obj, path, **kwargs):
        import xml.etree.ElementTree as ET

        def dict_to_node(tag, value):
            node = ET.Element(tag)
            if isinstance(value, dict):
                for k, v in value.items():
                    if k == "_text":
                        node.text = str(v)
                    elif isinstance(v, list):
                        for item in v:
                            node.append(dict_to_node(k, item))
                    else:
                        node.append(dict_to_node(k, v))
            else:
                node.text = str(value)
            return node

        if len(obj) != 1:
            raise ValueError("XML dump requires a single-root dict")
        tag, value = next(iter(obj.items()))
        ET.ElementTree(dict_to_node(tag, value)).write(path)


@FILE_HANDLERS.register(name=".npz", aliases=["npz"])
class NPZHandler(FileHandler):
    def load(self, path, **kwargs):
        import numpy as np
        return dict(np.load(path, allow_pickle=False, **kwargs))

    def dump(self, obj, path, **kwargs):
        import numpy as np
        np.savez_compressed(path, **obj)


def get_handler(path_or_ext) -> FileHandler:
    ext = Path(str(path_or_ext)).suffix or str(path_or_ext)
    return FILE_HANDLERS.build(ext.lower())


def load_file(path, **kwargs) -> Any:
    return get_handler(path).load(path, **kwargs)


def dump_file(obj, path, **kwargs) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    get_handler(path).dump(obj, path, **kwargs)
