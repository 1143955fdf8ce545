"""Minimal fake ``bpy``/``mathutils`` for testing datagen/blender_gen.py
without Blender.

Implements exactly the API surface blender_gen uses (data registries,
scene graph, compositor/material node trees, rigid-body ops, render op)
with a real pinhole projection in the render op: objects with a nonzero
pass_index are drawn as filled circles at their projected center, the
compositor's OutputFile nodes receive matching depth / IndexOB images,
and ``scene.render.filepath`` gets a real RGB PNG. That makes the
generated set geometrically consistent, so datagen/pair_producer.py's
``complete_blender`` can ingest it (visibility checks and all).
"""
import os
import types

import numpy as np

_REGISTRY = {"objects": [], "images": {}}


def _euler_xyz(e):
    cx, cy, cz = np.cos(e)
    sx, sy, sz = np.sin(e)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


class Socket:
    def __init__(self, owner, key):
        self.owner = owner
        self.name = key
        self.default_value = None


class Sockets(dict):
    def __init__(self, owner):
        super().__init__()
        self._owner = owner

    def __getitem__(self, key):
        if key not in self:
            super().__setitem__(key, Socket(self._owner, key))
        return super().__getitem__(key)


class Node:
    def __init__(self, type_name, name):
        self.type_name = type_name
        self.name = name
        self.inputs = Sockets(self)
        self.outputs = Sockets(self)
        self.base_path = ""
        self.format = types.SimpleNamespace(file_format="PNG")
        self.file_slots = [types.SimpleNamespace(path="")]
        self.image = None


_NODE_NAMES = {
    "ShaderNodeTexImage": "Image Texture",
    "CompositorNodeRLayers": "Render Layers",
    "CompositorNodeOutputFile": "File Output",
}


class NodeTree:
    def __init__(self, seed_nodes=()):
        self._nodes = {}
        self.links = types.SimpleNamespace(new=self._link_new)
        self.nodes = types.SimpleNamespace(
            new=self._node_new, get=self._nodes.get, clear=self._nodes.clear
        )
        self._links = []
        for name in seed_nodes:
            self._nodes[name] = Node(name, name)

    def _node_new(self, type_name):
        name = _NODE_NAMES.get(type_name, type_name)
        node = Node(type_name, name)
        self._nodes[name] = node
        return node

    def _link_new(self, out_sock, in_sock):
        self._links.append((out_sock, in_sock))


class Mesh:
    def __init__(self, name):
        self.name = name
        self.verts = None
        self.materials = _MaterialList()
        self.uv_layers = types.SimpleNamespace(new=lambda: None)

    def from_pydata(self, verts, edges, faces):
        self.verts = np.array(verts, float)


class _MaterialList(list):
    def append(self, mat):  # blender API name
        super().append(mat)


class Material:
    def __init__(self, name):
        self.name = name
        self._use_nodes = False
        self.node_tree = NodeTree(seed_nodes=("Principled BSDF",))

    @property
    def use_nodes(self):
        return self._use_nodes

    @use_nodes.setter
    def use_nodes(self, v):
        self._use_nodes = v


class World:
    def __init__(self, name):
        self.name = name
        self.use_nodes = False
        self.node_tree = NodeTree(seed_nodes=("Background",))


class Camera:
    def __init__(self, name):
        self.name = name
        self.sensor_width = 36.0
        self.lens = 50.0
        self.shift_x = 0.0
        self.shift_y = 0.0


class Light:
    def __init__(self, name, type="POINT"):
        self.name = name
        self.type = type
        self.energy = 0.0


class Object:
    def __init__(self, name, data=None):
        self.name = name
        self.data = data
        self.location = np.zeros(3)
        self.rotation_euler = np.zeros(3)
        self.pass_index = 0
        self.rigid_body = None
        if isinstance(data, Camera):
            self.type = "CAMERA"
        elif isinstance(data, Light):
            self.type = "LIGHT"
        else:
            self.type = "MESH"

    @property
    def matrix_world(self):
        m = np.eye(4)
        m[:3, :3] = _euler_xyz(np.asarray(self.rotation_euler, float))
        m[:3, 3] = np.asarray(self.location, float)
        return m


class Image:
    def __init__(self, name, arr=None, size=(8, 8)):
        self.name = name
        self._arr = arr
        if arr is not None:
            h, w = arr.shape[:2]
            self.size = (w, h)
        else:
            self.size = size

    @property
    def pixels(self):
        a = self._arr
        if a.ndim == 2:
            a = np.repeat(a[..., None], 4, axis=-1)
        return a.ravel().astype(np.float32)


class Scene:
    def __init__(self):
        self.collection = types.SimpleNamespace(
            objects=types.SimpleNamespace(link=self._link)
        )
        self._objects = []
        self.collection.objects.link = self._link
        self.render = types.SimpleNamespace(
            engine="", resolution_x=64, resolution_y=64, filepath="")
        self.view_layers = [types.SimpleNamespace(
            use_pass_z=False, use_pass_object_index=False)]
        self.use_nodes = False
        self.node_tree = NodeTree()
        self.world = None
        self.camera = None
        self.frame_current = 1
        self.gravity = (0.0, 0.0, -9.81)
        self.rigidbody_world = None

    def _link(self, ob):
        self._objects.append(ob)

    def __iter__(self):
        return iter(self._objects)

    def frame_set(self, n):
        self.frame_current = n


def _parse_verts(path):
    verts = []
    with open(path) as f:
        for ln in f:
            if ln.startswith("v "):
                verts.append([float(x) for x in ln.split()[1:4]])
    return np.array(verts, float)


def make_fake_bpy():
    """Fresh (bpy, mathutils) module pair sharing one scene."""
    scene = Scene()
    # scene.collection.objects must be iterable AND have .link
    objs = scene._objects

    class _SceneObjects:
        def link(self, ob):
            objs.append(ob)

        def __iter__(self):
            return iter(list(objs))

    scene.collection = types.SimpleNamespace(objects=_SceneObjects())

    images = {}
    selected = []

    bpy = types.ModuleType("bpy")
    mathutils = types.ModuleType("mathutils")
    mathutils.Vector = lambda seq: np.array(seq, float)
    mathutils.Euler = lambda seq: np.array(seq, float)

    def _new_obj(name, data=None):
        ob = Object(name, data)
        return ob

    def _remove_obj(ob, do_unlink=False):
        if ob in objs:
            objs.remove(ob)

    def _load_image(path):
        if path.endswith(".exr"):
            arr = np.load(path)
            img = Image(os.path.basename(path), arr)
        else:
            img = Image(os.path.basename(path))
        images[img.name] = img
        return img

    bpy.data = types.SimpleNamespace(
        cameras=types.SimpleNamespace(new=Camera),
        meshes=types.SimpleNamespace(new=Mesh),
        materials=types.SimpleNamespace(new=Material),
        worlds=types.SimpleNamespace(new=World),
        lights=types.SimpleNamespace(
            new=lambda name, type="POINT": Light(name, type)),
        objects=types.SimpleNamespace(new=_new_obj, remove=_remove_obj),
        images=types.SimpleNamespace(
            load=_load_image, get=images.get,
            remove=lambda img: images.pop(img.name, None)),
    )

    view_layer = types.SimpleNamespace(
        objects=types.SimpleNamespace(active=None))
    bpy.context = types.SimpleNamespace(
        scene=scene, selected_objects=selected, view_layer=view_layer)

    class SceneEEVEE:  # presence selects BLENDER_EEVEE_NEXT
        pass

    bpy.types = types.SimpleNamespace(SceneEEVEE=SceneEEVEE)

    # ---- operators ----------------------------------------------------
    def _rb_world_add():
        scene.rigidbody_world = types.SimpleNamespace(
            point_cache=types.SimpleNamespace(frame_start=1))

    def _rb_object_add():
        ob = view_layer.objects.active
        ob.rigid_body = types.SimpleNamespace(
            type="ACTIVE", collision_shape="BOX")

    def _import_mesh(filepath):
        mesh = Mesh(os.path.basename(filepath))
        mesh.verts = _parse_verts(filepath)
        ob = Object(os.path.basename(filepath), mesh)
        selected.clear()
        selected.append(ob)
        objs.append(ob)

    def _render(write_still=False):
        w = scene.render.resolution_x
        h = scene.render.resolution_y
        cam = scene.camera
        fx = cam.data.lens * w / cam.data.sensor_width
        fy = fx
        cx = w / 2.0 - cam.data.shift_x * w
        cy = cam.data.shift_y * w + h / 2.0
        cam_inv = np.linalg.inv(cam.matrix_world)

        rgb = np.full((h, w, 3), 90, np.uint8)
        depth = np.full((h, w), 10.0, np.float32)  # far background
        index = np.zeros((h, w), np.float32)
        vv, uu = np.mgrid[0:h, 0:w]
        for ob in objs:
            if ob.pass_index <= 0 or ob.data is None or ob.data.verts is None:
                continue
            radius = float(np.linalg.norm(ob.data.verts, axis=1).max())
            p = cam_inv @ np.append(ob.matrix_world[:3, 3], 1.0)
            # blender cam looks down -Z with +Y up -> cv cam frame:
            xc, yc, zc = p[0], -p[1], -p[2]
            if zc <= 1e-6:
                continue
            u = fx * xc / zc + cx
            v = fy * yc / zc + cy
            r_px = max(fx * radius / zc, 1.0)
            mask = (uu - u) ** 2 + (vv - v) ** 2 <= r_px ** 2
            rgb[mask] = (200, 60, 60)
            depth[mask] = zc
            index[mask] = float(ob.pass_index)

        if scene.render.filepath:
            from PIL import Image as PILImage

            PILImage.fromarray(rgb).save(scene.render.filepath)

        # Route compositor links: Depth / IndexOB -> OutputFile nodes.
        frame = scene.frame_current
        for out_sock, in_sock in scene.node_tree._links:
            node = in_sock.owner
            if node.type_name != "CompositorNodeOutputFile":
                continue
            arr = depth if out_sock.name == "Depth" else index
            path = os.path.join(
                node.base_path,
                f"{node.file_slots[0].path}{frame:04d}.exr")
            with open(path, "wb") as f:
                np.save(f, arr[::-1])  # blender buffers are bottom-up

    bpy.ops = types.SimpleNamespace(
        rigidbody=types.SimpleNamespace(
            world_add=_rb_world_add, object_add=_rb_object_add),
        import_mesh=types.SimpleNamespace(ply=lambda filepath: _import_mesh(filepath)),
        wm=types.SimpleNamespace(obj_import=lambda filepath: _import_mesh(filepath)),
        render=types.SimpleNamespace(render=lambda write_still=False: _render(write_still)),
    )
    return bpy, mathutils
