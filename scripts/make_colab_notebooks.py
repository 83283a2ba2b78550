"""Generate the distribution Colab notebooks under colab/.

(reference: colab/ ships 4 notebooks — beatheritage_v1_inference,
mapperatorinator_inference, mai_mod_inference, classifier_classify; ours
target a Colab TPU runtime and drive the beatheritage_tpu apps.)
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "colab"

REPO_URL = "https://github.com/beatheritage/beatheritage-tpu"

SETUP = ("""\
#@title Setup environment { display-mode: "form" }
#@markdown Use this tool responsibly: disclose AI usage in your beatmap
#@markdown descriptions and respect the original artists and mappers.
i_accept_the_rules = False  #@param {type:"boolean"}
if not i_accept_the_rules:
    raise ValueError("Please accept the rules checkbox before running.")

import os
%pip -q install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
!git clone --depth 1 """ + REPO_URL + """ beatheritage-tpu 2>/dev/null || true
%cd beatheritage-tpu
%pip -q install -e .
import jax
print("devices:", jax.devices())
""")

UPLOAD = """\
#@title Upload audio file { display-mode: "form" }
from google.colab import files  # noqa
from pathlib import Path
uploaded = files.upload()
audio_path = str(Path(list(uploaded)[0]).resolve()) if uploaded else ""
print("audio:", audio_path)
"""

DOWNLOAD = """\
#@title Download generated files { display-mode: "form" }
import shutil
from google.colab import files  # noqa
shutil.make_archive("beatmaps", "zip", output_path)
files.download("beatmaps.zip")
"""


def nb(cells: list[tuple[str, str]]) -> dict:
    return {
        "nbformat": 4, "nbformat_minor": 0,
        "metadata": {
            "colab": {"provenance": [], "gpuType": "V28"},
            "accelerator": "TPU",
            "kernelspec": {"name": "python3", "display_name": "Python 3"},
        },
        "cells": [
            {"cell_type": kind,
             "metadata": {"cellView": "form"} if kind == "code" else {},
             "source": src.splitlines(keepends=True),
             **({"outputs": [], "execution_count": None}
                if kind == "code" else {})}
            for kind, src in cells
        ],
    }


def generation_notebook(title: str, versions: list[str], default: str) -> dict:
    configure = f"""\
#@title Configure generation {{ display-mode: "form" }}
model_version = "{default}"  #@param {json.dumps(versions)}
gamemode = "Standard"  #@param ["Standard", "Taiko", "Catch the Beat", "Mania"]
difficulty = 5.5  #@param {{type:"slider", min:1, max:10, step:0.1}}
year = 2023  #@param {{type:"integer"}}
mapper_id = 0  #@param {{type:"integer"}}
descriptors = ""  #@param {{type:"string"}}
super_timing = False  #@param {{type:"boolean"}}
cfg_scale = 1.0  #@param {{type:"number"}}
seed = 0  #@param {{type:"integer"}}

GAMEMODES = {{"Standard": 0, "Taiko": 1, "Catch the Beat": 2, "Mania": 3}}
output_path = "/content/output"
overrides = [
    f"audio_path={{audio_path}}", f"output_path={{output_path}}",
    f"gamemode={{GAMEMODES[gamemode]}}", f"difficulty={{difficulty}}",
    f"year={{year}}", f"super_timing={{str(super_timing).lower()}}",
    f"cfg_scale={{cfg_scale}}",
]
if mapper_id:
    overrides.append(f"mapper_id={{mapper_id}}")
if seed:
    overrides.append(f"seed={{seed}}")
if descriptors:
    overrides.append("descriptors=[" + descriptors + "]")
config = model_version.split()[-1].lower().replace("(enhanced)", "beatheritage_v1")
print(config, overrides)
"""
    generate = """\
#@title Generate beatmap { display-mode: "form" }
import subprocess, sys
cmd = [sys.executable, "-m", "beatheritage_tpu.apps.cli", "-cn", config] + overrides
print(" ".join(cmd))
proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
for line in proc.stdout:
    print(line, end="")
proc.wait()
"""
    return nb([
        ("markdown", f"# {title}\n\nGenerate a playable osu! beatmap from "
                     "any song with the TPU-native BeatHeritage framework.\n\n"
                     "Runtime > Change runtime type > **TPU**."),
        ("code", SETUP),
        ("code", UPLOAD),
        ("code", configure),
        ("code", generate),
        ("code", DOWNLOAD),
        ("markdown", "### Tips\n- enable `super_timing` for variable-BPM songs\n"
                     "- match difficulty to song intensity\n"
                     "- add style descriptors (e.g. `jump aim, clean`)"),
    ])


def maimod_notebook() -> dict:
    upload_map = """\
#@title Upload beatmap + audio { display-mode: "form" }
from google.colab import files  # noqa
from pathlib import Path
print("upload the .osu file, then the audio file")
up = files.upload()
beatmap_path = str(Path([k for k in up if k.endswith('.osu')][0]).resolve())
up2 = files.upload()
audio_path = str(Path(list(up2)[0]).resolve())
"""
    run = """\
#@title Run MaiMod analysis { display-mode: "form" }
model_version = "v31"  #@param ["beatheritage_v1", "v31", "v30"]
import subprocess, sys
cmd = [sys.executable, "-m", "beatheritage_tpu.apps.maimod", "-cn", model_version,
       f"beatmap_path={beatmap_path}", f"audio_path={audio_path}"]
proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
for line in proc.stdout:
    print(line, end="")
proc.wait()
"""
    return nb([
        ("markdown", "# MaiMod — AI beatmap modding\n\nTeacher-forced "
                     "surprisal review: the model flags beatmap decisions it "
                     "finds unlikely, grouped by category with osu://edit "
                     "links."),
        ("code", SETUP),
        ("code", upload_map),
        ("code", run),
    ])


def classifier_notebook() -> dict:
    run = """\
#@title Classify the mapper { display-mode: "form" }
checkpoint_path = ""  #@param {type:"string"}
top_k = 20  #@param {type:"integer"}
import subprocess, sys
cmd = [sys.executable, "-m", "beatheritage_tpu.apps.classify", "-cn", "tiny",
       f"beatmap_path={beatmap_path}", f"audio_path={audio_path}",
       f"top_k={top_k}"]
if checkpoint_path:
    cmd.append(f"checkpoint_path={checkpoint_path}")
proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
for line in proc.stdout:
    print(line, end="")
proc.wait()
"""
    upload_map = """\
#@title Upload beatmap + audio { display-mode: "form" }
from google.colab import files  # noqa
from pathlib import Path
print("upload the .osu file, then the audio file")
up = files.upload()
beatmap_path = str(Path([k for k in up if k.endswith('.osu')][0]).resolve())
up2 = files.upload()
audio_path = str(Path(list(up2)[0]).resolve())
"""
    return nb([
        ("markdown", "# osu! mapper classifier\n\nWho mapped this beatmap? "
                     "Whisper-style classifier over 8 s windows; its feature "
                     "head is also the FID extractor."),
        ("code", SETUP),
        ("code", upload_map),
        ("code", run),
    ])


def main() -> int:
    OUT.mkdir(exist_ok=True)
    notebooks = {
        "beatheritage_v1_inference.ipynb": generation_notebook(
            "BeatHeritage V1 — Beatmap Generator",
            ["BeatHeritage V1 (Enhanced)", "Mapperatorinator V31",
             "Mapperatorinator V30", "Mapperatorinator V29",
             "Mapperatorinator V28"],
            "BeatHeritage V1 (Enhanced)"),
        "mapperatorinator_inference.ipynb": generation_notebook(
            "Mapperatorinator — Beatmap Generator",
            ["Mapperatorinator V31", "Mapperatorinator V30",
             "Mapperatorinator V29", "Mapperatorinator V28"],
            "Mapperatorinator V31"),
        "mai_mod_inference.ipynb": maimod_notebook(),
        "classifier_classify.ipynb": classifier_notebook(),
    }
    for name, content in notebooks.items():
        (OUT / name).write_text(json.dumps(content, indent=1))
        print("wrote", OUT / name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
