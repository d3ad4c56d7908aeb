"""Camera metadata parsers: Metashape XML (S2) and COLMAP text (S3).

Reference: ``cameras/derived_cameras.py:44-149`` (Metashape),
``cameras/derived_cameras.py:199-321`` (COLMAP: cameras.txt/images.txt with
quaternion→matrix and world_to_cam inversion), transform parsing
``utils/parsing.py:71-134``.

The parsers are pure functions string → camera rows so they run either
driver-side (one XML per project — tiny) or inside ``mapInPandas`` over
media spans carrying XML/text payloads.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np


def parse_metashape_xml(xml_text: str) -> tuple[list[dict], dict]:
    """→ (camera rows, chunk_transform). Camera rows carry the 4×4
    cam_to_chunk transform, intrinsics and distortion; the chunk transform
    (rotation/translation/scale → 4×4 chunk_to_ecef) composes to world.
    """
    root = ET.fromstring(xml_text)
    chunk = root.find(".//chunk")
    sensors = {}
    for s in chunk.findall(".//sensor"):
        sid = int(s.get("id"))
        calib = s.find("calibration")
        props = {"f": None, "cx": 0.0, "cy": 0.0, "w": None, "h": None,
                 "distortion": {}}
        res = s.find("resolution")
        if res is not None:
            props["w"] = int(res.get("width"))
            props["h"] = int(res.get("height"))
        if calib is not None:
            cres = calib.find("resolution")
            if cres is not None:
                props["w"] = int(cres.get("width"))
                props["h"] = int(cres.get("height"))
            for tag in ("f", "cx", "cy"):
                el = calib.find(tag)
                if el is not None:
                    props[tag] = float(el.text)
            for tag in ("k1", "k2", "k3", "k4", "p1", "p2", "b1", "b2"):
                el = calib.find(tag)
                if el is not None:
                    props["distortion"][tag] = float(el.text)
        sensors[sid] = props

    # chunk → ECEF transform: rotation (9), translation (3), scale (1)
    transform = {"local_to_ecef": np.eye(4), "scale": 1.0}
    tr = chunk.find("transform")
    if tr is not None:
        rot = tr.find("rotation")
        trans = tr.find("translation")
        scale = tr.find("scale")
        T = np.eye(4)
        s = float(scale.text) if scale is not None else 1.0
        if rot is not None:
            R = np.array([float(v) for v in rot.text.split()]).reshape(3, 3)
            T[:3, :3] = R * s
        if trans is not None:
            T[:3, 3] = [float(v) for v in trans.text.split()]
        transform = {"local_to_ecef": T, "scale": s}

    rows = []
    for cam in chunk.findall(".//camera"):
        tr_el = cam.find("transform")
        if tr_el is None or cam.get("enabled") in ("false", "0"):
            continue
        sid = int(cam.get("sensor_id", "0"))
        props = sensors.get(sid, {})
        c2w = np.array([float(v) for v in tr_el.text.split()]).reshape(4, 4)
        rows.append({
            "camera_id": int(cam.get("id")),
            "image_ref": cam.get("label", ""),
            "cam_to_world": c2w.ravel().tolist(),   # chunk frame
            "f": props.get("f"), "cx": props.get("cx", 0.0),
            "cy": props.get("cy", 0.0),
            "w": props.get("w"), "h": props.get("h"),
            "distortion": dict(props.get("distortion", {})),
            "sensor_id": sid,
        })
    return rows, transform


def quaternion_to_matrix(qw: float, qx: float, qy: float, qz: float) -> np.ndarray:
    """Unit quaternion → 3×3 rotation (COLMAP convention, w first)."""
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
    ])


def parse_colmap(cameras_txt: str, images_txt: str) -> list[dict]:
    """COLMAP text model → camera rows. images.txt lines hold
    (image_id, qw qx qy qz, tx ty tz, camera_id, name) as WORLD_TO_CAM;
    we invert to cam_to_world (reference ``derived_cameras.py:199-321``)."""
    intr = {}
    for line in cameras_txt.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        cam_id, model, w, h = int(parts[0]), parts[1], int(parts[2]), int(parts[3])
        params = [float(p) for p in parts[4:]]
        dist: dict[str, float] = {}
        if model == "SIMPLE_PINHOLE":
            f, cx, cy = params[0], params[1], params[2]
        elif model == "SIMPLE_RADIAL":
            # params = f, cx, cy, k — the radial coefficient maps to k1
            f, cx, cy = params[0], params[1], params[2]
            if len(params) > 3 and params[3] != 0.0:
                dist["k1"] = params[3]
        elif model == "PINHOLE":
            # params = fx, fy, cx, cy — the engine models one focal length;
            # anisotropic pixels would project wrong silently, so reject
            fx, fy = params[0], params[1]
            if abs(fx - fy) > 1e-6 * max(abs(fx), 1.0):
                raise ValueError(
                    f"COLMAP camera {cam_id}: PINHOLE fx={fx} != fy={fy}; "
                    "anisotropic intrinsics are not supported")
            f, cx, cy = fx, params[2], params[3]
        elif model == "RADIAL":
            # params = f, cx, cy, k1, k2
            f, cx, cy = params[0], params[1], params[2]
            for key, idx in (("k1", 3), ("k2", 4)):
                if len(params) > idx and params[idx] != 0.0:
                    dist[key] = params[idx]
        elif model == "OPENCV":
            # params = fx, fy, cx, cy, k1, k2, p1, p2
            fx, fy = params[0], params[1]
            if abs(fx - fy) > 1e-6 * max(abs(fx), 1.0):
                raise ValueError(
                    f"COLMAP camera {cam_id}: OPENCV fx={fx} != fy={fy}; "
                    "anisotropic intrinsics are not supported")
            f, cx, cy = fx, params[2], params[3]
            for key, idx in (("k1", 4), ("k2", 5), ("p1", 6), ("p2", 7)):
                if len(params) > idx and params[idx] != 0.0:
                    dist[key] = params[idx]
        else:
            raise ValueError(
                f"COLMAP camera {cam_id}: unsupported model {model!r} "
                "(supported: SIMPLE_PINHOLE, SIMPLE_RADIAL, PINHOLE, "
                "RADIAL, OPENCV)")
        intr[cam_id] = {"f": f, "cx": cx - w / 2, "cy": cy - h / 2,
                        "w": w, "h": h, "distortion": dist}

    rows = []
    lines = [l.strip() for l in images_txt.splitlines()
             if l.strip() and not l.startswith("#")]
    # images.txt alternates pose line / 2D-points line
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        if len(parts) < 10:
            continue
        image_id = int(parts[0])
        qw, qx, qy, qz = (float(v) for v in parts[1:5])
        t = np.array([float(v) for v in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        R = quaternion_to_matrix(qw, qx, qy, qz)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        k = intr.get(cam_id, {})
        rows.append({
            "camera_id": image_id, "image_ref": name,
            "cam_to_world": c2w.ravel().tolist(),
            "f": k.get("f"), "cx": k.get("cx", 0.0), "cy": k.get("cy", 0.0),
            "w": k.get("w"), "h": k.get("h"),
            "distortion": k.get("distortion", {}), "sensor_id": cam_id,
        })
    return rows
