// BeatHeritage TPU web UI logic (reference: static/app.js behaviors —
// per-gamemode field visibility, tqdm progress parsing, localStorage
// persistence, config export/import, descriptor chips, MaiMod view).

const $ = (id) => document.getElementById(id);
const form = $("f");

// ---- tabs ------------------------------------------------------------------

function showTab(name) {
  $("page-generate").hidden = name !== "generate";
  $("page-maimod").hidden = name !== "maimod";
  $("tab-generate").classList.toggle("active", name === "generate");
  $("tab-maimod").classList.toggle("active", name === "maimod");
}
$("tab-generate").onclick = () => showTab("generate");
$("tab-maimod").onclick = () => showTab("maimod");

// ---- model list + descriptors ----------------------------------------------

let descriptors = [];
const selectedDescriptors = new Set();

async function loadModels() {
  const names = await (await fetch("/models")).json();
  for (const sel of [$("model"), $("maimod-model")]) {
    sel.innerHTML = names
      .map((n) => `<option value="${n}">${n}</option>`)
      .join("");
  }
  const saved = localStorage.getItem("bh_model");
  if (saved && names.includes(saved)) $("model").value = saved;
  await loadDescriptors();
}

async function loadDescriptors() {
  const cfg = $("model").value;
  localStorage.setItem("bh_model", cfg);
  descriptors = await (
    await fetch("/descriptors?config=" + encodeURIComponent(cfg))
  ).json();
  renderDescriptors();
  await loadContextOptions();
  await loadCapabilities();
}

function renderDescriptors() {
  const q = $("descsearch").value.toLowerCase();
  const box = $("descsel");
  box.innerHTML = "";
  for (const d of descriptors) {
    if (q && !d.toLowerCase().includes(q) && !selectedDescriptors.has(d)) continue;
    const chip = document.createElement("span");
    chip.className = "chip" + (selectedDescriptors.has(d) ? " on" : "");
    chip.textContent = d;
    chip.onclick = () => {
      selectedDescriptors.has(d)
        ? selectedDescriptors.delete(d)
        : selectedDescriptors.add(d);
      renderDescriptors();
    };
    box.appendChild(chip);
  }
  box.parentElement.style.display = descriptors.length ? "" : "none";
}
$("descsearch").oninput = renderDescriptors;
$("model").onchange = loadDescriptors;

async function loadContextOptions() {
  const cfg = $("model").value;
  const opts = await (
    await fetch("/context_options?config=" + encodeURIComponent(cfg))
  ).json();
  const box = $("in-context-checks");
  box.innerHTML = "";
  for (const ctx of opts) {
    const lbl = document.createElement("label");
    lbl.className = "check";
    lbl.innerHTML = `<input type="checkbox" name="in_context_options" value="${ctx}"> ${ctx}`;
    box.appendChild(lbl);
  }
  $("in-context-options-box").style.display = opts.length ? "" : "none";
}

// ---- per-model capabilities (reference app.js modelCapabilities, but
// introspected from the model's train config via /capabilities) --------------

let CAPS = {};
async function loadCapabilities() {
  const cfg = $("model").value;
  try {
    CAPS = await (
      await fetch("/capabilities?config=" + encodeURIComponent(cfg))
    ).json();
  } catch (e) {
    CAPS = {};
  }
  // gamemode options the model was trained on
  const gmSel = $("gamemode");
  if (gmSel && CAPS.supported_gamemodes) {
    for (const opt of gmSel.options) {
      if (opt.value === "") continue;
      const ok = CAPS.supported_gamemodes.includes(+opt.value);
      opt.hidden = !ok;
      if (!ok && gmSel.value === opt.value) gmSel.value = "";
    }
  }
  // conditioning fields the model has no tokens for
  const capGroups = {
    "group-year": CAPS.supports_year,
    "group-hitsounded": CAPS.supports_hitsounds,
  };
  for (const [id, ok] of Object.entries(capGroups)) {
    const el = $(id);
    if (el) el.style.display = ok === false ? "none" : "";
  }
  // (descriptor visibility already follows the per-model /descriptors list)
  updateVisibility();
}
// (model changes reach here through loadDescriptors -> loadCapabilities)

// ---- per-gamemode visibility (reference app.js updateVisibility) -----------

const GROUPS = {
  "group-circle_size": [0, 2],
  "group-approach_rate": [0, 2],
  "group-slider_multiplier": [0, 1, 2],
  "group-slider_tick_rate": [0, 1, 2],
  "group-keycount": [3],
  "group-hold_note_ratio": [3],
  "group-scroll_speed_ratio": [1, 3],
};
function updateVisibility() {
  const gm = $("gamemode").value;
  for (const [id, modes] of Object.entries(GROUPS)) {
    const el = $(id);
    if (el) el.style.display = gm === "" || modes.includes(+gm) ? "" : "none";
  }
}
$("gamemode").onchange = updateVisibility;
updateVisibility();

// ---- path validation --------------------------------------------------------

for (const el of document.querySelectorAll("input[data-validate]")) {
  el.addEventListener("blur", async () => {
    el.classList.remove("valid", "invalid");
    if (!el.value) return;
    const r = await fetch(
      `/validate_path?kind=${el.dataset.validate}&path=${encodeURIComponent(el.value)}`
    );
    const j = await r.json();
    el.classList.add(j.valid ? "valid" : "invalid");
    el.title = j.valid ? "" : j.reason;
  });
}

// ---- config persistence / export / import ----------------------------------

function formState() {
  const data = Object.fromEntries(new FormData(form));
  for (const cb of form.querySelectorAll("input[type=checkbox]"))
    data[cb.name] = cb.checked;
  data.in_context_options = [
    ...form.querySelectorAll("input[name=in_context_options]:checked"),
  ].map((e) => e.value);
  data.descriptor_select = [...selectedDescriptors];
  return data;
}
function applyState(data) {
  for (const [k, v] of Object.entries(data)) {
    const el = form.elements[k];
    if (!el || k === "in_context_options") continue;
    if (el.type === "checkbox") el.checked = !!v;
    else el.value = v ?? "";
  }
  selectedDescriptors.clear();
  for (const d of data.descriptor_select || []) selectedDescriptors.add(d);
  renderDescriptors();
  updateVisibility();
}
form.addEventListener("change", () =>
  localStorage.setItem("bh_config", JSON.stringify(formState()))
);
$("export-config-btn").onclick = () => {
  const blob = new Blob([JSON.stringify(formState(), null, 2)], {
    type: "application/json",
  });
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "beatheritage_config.json";
  a.click();
};
$("import-config-btn").onclick = () => $("import-config-input").click();
$("import-config-input").onchange = async (e) => {
  const file = e.target.files[0];
  if (file) applyState(JSON.parse(await file.text()));
};
$("reset-config-btn").onclick = () => {
  localStorage.removeItem("bh_config");
  form.reset();
  selectedDescriptors.clear();
  renderDescriptors();
  updateVisibility();
};

// ---- server-side presets (/save_config, /load_config, /list_presets) -------

async function refreshPresets() {
  const names = await (await fetch("/list_presets")).json();
  $("preset-select").innerHTML = names
    .map((n) => `<option value="${n}">${n}</option>`)
    .join("");
}
$("save-preset-btn").onclick = async () => {
  const name = $("preset-name").value.trim();
  if (!name) return alert("Preset needs a name");
  const r = await fetch("/save_config", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ name, form: formState() }),
  });
  const j = await r.json();
  if (!j.success) alert("Save failed: " + j.error);
  await refreshPresets();
  $("preset-select").value = name;
};
$("load-preset-btn").onclick = async () => {
  const name = $("preset-select").value;
  if (!name) return;
  const r = await fetch("/load_config?name=" + encodeURIComponent(name));
  if (r.ok) applyState(await r.json());
};
refreshPresets();

// ---- path autofill (/validate_paths, reference web-ui.py:514) --------------

$("autofill-btn").onclick = async () => {
  const r = await fetch("/validate_paths", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      audio_path: $("audio_path").value,
      beatmap_path: $("beatmap_path").value,
      output_path: $("output_path").value,
    }),
  });
  const j = await r.json();
  if (j.audio_path) $("audio_path").value = j.audio_path;
  if (j.output_path) $("output_path").value = j.output_path;
  if (j.errors && j.errors.length) alert(j.errors.join("\n"));
};

// ---- open folder / log file -------------------------------------------------

$("open-folder-btn").onclick = () => {
  const folder =
    $("output_path").value ||
    ($("result-path").textContent || "").replace(/\/[^/]*$/, "");
  if (folder) fetch("/open_folder?folder=" + encodeURIComponent(folder));
};
$("open-log-btn").onclick = () => fetch("/open_log_file");
try {
  const saved = localStorage.getItem("bh_config");
  if (saved) applyState(JSON.parse(saved));
} catch (e) {
  /* stale state */
}

// ---- progress streaming (tqdm parsing, reference app.js progress regex) ----

const TQDM = /(\d+)%\|.*?\| *(\d+)\/(\d+)/;
const PCT = /(\d+(?:\.\d+)?)%/;

async function streamInto(logEl, onLine) {
  const resp = await fetch("/stream_output");
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = "";
  while (true) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += dec.decode(value);
    const parts = buf.split(/[\r\n]/);
    buf = parts.pop();
    for (const line of parts) {
      if (!line.trim()) continue;
      if (onLine) onLine(line);
      // tqdm lines overwrite in place like a terminal would
      const lines = logEl.textContent.split("\n");
      if (TQDM.test(line) && TQDM.test(lines[lines.length - 1] || ""))
        lines[lines.length - 1] = line;
      else lines.push(line);
      logEl.textContent = lines.slice(-400).join("\n");
      logEl.scrollTop = logEl.scrollHeight;
    }
  }
}

function parseProgress(line) {
  const m = line.match(TQDM) || line.match(PCT);
  if (!m) return;
  $("progress-wrap").hidden = false;
  $("progress-fill").style.width = m[1] + "%";
  $("progress-label").textContent = m[0].slice(0, 40);
}

// ---- generate ----------------------------------------------------------------

form.onsubmit = async (e) => {
  e.preventDefault();
  const log = $("progress_output");
  log.textContent = "";
  $("result-box").hidden = true;
  $("progress-wrap").hidden = true;
  const r = await fetch("/start_inference", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(formState()),
  });
  if (!r.ok) {
    log.textContent = "error: " + (await r.json()).error;
    return;
  }
  let resultPath = null;
  await streamInto(log, (line) => {
    parseProgress(line);
    const m = line.match(/saved to (.*\.osu)|Added generated content to (.*\.osu)/);
    if (m) resultPath = m[1] || m[2];
  });
  if (resultPath) {
    $("result-box").hidden = false;
    $("result-path").textContent = resultPath;
  }
};
$("cancel-button").onclick = () => fetch("/cancel", { method: "POST" });

// ---- MaiMod -------------------------------------------------------------------

$("maimod-form").onsubmit = async (e) => {
  e.preventDefault();
  const log = $("maimod-log");
  const results = $("maimod-results");
  log.textContent = "";
  results.innerHTML = "";
  const data = Object.fromEntries(new FormData($("maimod-form")));
  const r = await fetch("/start_maimod", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(data),
  });
  if (!r.ok) {
    log.textContent = "error: " + (await r.json()).error;
    return;
  }
  await streamInto(log, null);
  const suggs = await (await fetch("/maimod_result")).json();
  renderSuggestions(suggs);
};
$("maimod-cancel").onclick = () => fetch("/cancel", { method: "POST" });

function renderSuggestions(suggs) {
  const box = $("maimod-results");
  if (!suggs.length) {
    box.innerHTML = "<p>No issues found — the model agrees with this beatmap.</p>";
    return;
  }
  const byCat = {};
  for (const s of suggs) (byCat[s.category] ||= []).push(s);
  for (const cat of Object.keys(byCat).sort()) {
    const head = document.createElement("div");
    head.className = "cat-head";
    head.textContent = `${cat} (${byCat[cat].length})`;
    box.appendChild(head);
    for (const s of byCat[cat].slice(0, 25)) {
      const div = document.createElement("div");
      div.className = "sugg" + (s.severity >= 5 ? " hot" : "");
      div.innerHTML =
        `<a href="${s.edit_link}">${s.timestamp}</a> ` +
        `<strong>${s.message}</strong>` +
        `<div class="meta">severity ${s.severity} — got ${s.actual}, ` +
        `model expected ${s.expected}</div>`;
      box.appendChild(div);
    }
  }
}

loadModels();
