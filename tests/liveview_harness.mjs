// Executes the SHIPPED liveview.html page script (extracted verbatim,
// never a copy) under stubbed DOM/WebSocket/fetch/timers, and drives
// the S1-shaped scenario: subscribe-then-snapshot buffering, replay,
// live apply, reconnect healing, and the snapshot-failure path.
// Prints one JSON line of checkpoint observations for pytest.
import { readFileSync } from "node:fs";

const html = readFileSync(process.argv[2], "utf8");
const script = html.match(/<script>([\s\S]*?)<\/script>/)[1];

// ---- DOM stub --------------------------------------------------------
function el(tag) {
  return {
    tag,
    children: [],
    dataset: {},
    _text: "",
    className: "",
    set textContent(v) { this._text = String(v); },
    get textContent() { return this._text; },
    append(...xs) { this.children.push(...xs); },
    replaceChildren(...xs) { this.children = xs; },
    focus() {},
  };
}
const conn = el("span"), rows = el("div"), count = el("span");
const form = Object.assign(el("form"), {
  text: { value: "", focus() {} },
  who: { value: "" },
});
globalThis.document = {
  getElementById(id) {
    return { conn, rows, count, compose: form }[id];
  },
  createElement: el,
};

// ---- network / timer stubs ------------------------------------------
const fetchCalls = [];
globalThis.fetch = (url, opts) => {
  const rec = { url, opts };
  fetchCalls.push(rec);
  rec.promise = new Promise((res, rej) => { rec.resolve = res; rec.reject = rej; });
  return rec.promise;
};
const sockets = [];
globalThis.WebSocket = class {
  constructor(url) { this.url = url; sockets.push(this); }
  close() { this.closed = true; if (this.onclose) this.onclose(); }
};
const timers = [];
const realSetImmediate = setImmediate;
globalThis.setTimeout = (fn, ms) => { timers.push({ fn, ms }); return timers.length; };
const tick = () => new Promise((r) => realSetImmediate(() => realSetImmediate(r)));

// ---- run the page ----------------------------------------------------
(0, eval)(script);

const out = {};
const viewIds = () => rows.children.map((a) => a.dataset.id);
const upsert = (id, createTime, message) =>
  JSON.stringify({ type: "UPSERT", id, content: { id, createTime, username: "u", message } });
const del = (id) => JSON.stringify({ type: "DELETE", id });

const main = async () => {
  const s0 = sockets[0];
  out.dialed_on_load = sockets.length === 1 && typeof s0.url === "string";

  // open: snapshot fetch goes out, feed is live but NOT bootstrapped
  s0.onopen();
  out.snapshot_requested = fetchCalls.length === 1 && fetchCalls[0].url === "/api/messages";
  out.conn_class_up = conn.className === "up";

  // frames arriving while the snapshot is in flight must BUFFER
  s0.onmessage({ data: upsert("a", "2025-01-02T00:00:00Z", "a-v2") });
  s0.onmessage({ data: del("b") });
  out.buffered_not_applied = rows.children.length === 0 && count._text === "";

  // snapshot resolves with the PRE-gap server state: a-v1, b, c
  fetchCalls[0].resolve({
    json: () => Promise.resolve([
      { id: "a", createTime: "2025-01-01T00:00:00Z", username: "u", message: "a-v1" },
      { id: "b", createTime: "2025-01-01T01:00:00Z", username: "u", message: "b-v1" },
      { id: "c", createTime: "2025-01-03T00:00:00Z", username: "u", message: "c-v1" },
    ]),
  });
  await tick();
  // replay on top: a upgraded to v2, b deleted; order createTime desc
  out.after_bootstrap = viewIds();
  out.after_bootstrap_count = count._text;
  out.a_is_v2 = rows.children.some(
    (art) => art.dataset.id === "a" && art.children.some((p) => p.tag === "p" && p._text === "a-v2")
  );

  // post-bootstrap frames apply immediately (same createTime as c:
  // id desc breaks the tie deterministically)
  s0.onmessage({ data: upsert("d", "2025-01-03T00:00:00Z", "d-v1") });
  out.live_apply = viewIds();

  // reconnect: close -> timer -> new dial; snapshot heals to server state
  s0.onclose();
  out.reconnect_scheduled = timers.length === 1;
  out.conn_class_down = conn.className === "down";
  timers[0].fn();
  const s1 = sockets[1];
  s1.onopen();
  fetchCalls[1].resolve({
    json: () => Promise.resolve([
      { id: "x", createTime: "2025-02-01T00:00:00Z", username: "u", message: "x-v1" },
    ]),
  });
  await tick();
  out.healed_to_server_state = viewIds();

  // snapshot FAILURE path: stay live on the buffered feed, old view kept
  s1.onclose();
  timers[1].fn();
  const s2 = sockets[2];
  s2.onopen();
  s2.onmessage({ data: upsert("y", "2025-03-01T00:00:00Z", "y-v1") });
  fetchCalls[2].reject(new Error("api down"));
  await tick();
  out.failure_path = viewIds();

  console.log(JSON.stringify(out));
};
main().catch((e) => { console.error(e); process.exit(1); });
