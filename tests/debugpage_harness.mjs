// Executes the SHIPPED debug.html page script under the same stub
// harness as liveview_harness.mjs: raw-feed tap semantics — every
// frame appended verbatim (pretty-printed when JSON), newest last,
// clear button wipes, reconnect re-dials.
import { readFileSync } from "node:fs";

const html = readFileSync(process.argv[2], "utf8");
const script = html.match(/<script>([\s\S]*?)<\/script>/)[1];

function el(tag) {
  return {
    tag,
    children: [],
    className: "",
    style: {},
    _text: "",
    set textContent(v) { this._text = String(v); },
    get textContent() { return this._text; },
    append(...xs) { this.children.push(...xs); },
    replaceChildren(...xs) { this.children = xs; },
  };
}
const where = el("code"), state = el("span"), feed = el("div"), wipe = el("button");
globalThis.document = {
  getElementById(id) { return { where, state, feed, wipe }[id]; },
  createElement: el,
};
const sockets = [];
globalThis.WebSocket = class {
  constructor(url) { this.url = url; sockets.push(this); }
  close() { this.closed = true; }
};
const timers = [];
globalThis.setTimeout = (fn, ms) => { timers.push({ fn, ms }); return timers.length; };

(0, eval)(script);

const out = {};
out.shows_ws_url = where._text === "__WS_URL__";
const s0 = sockets[0];
out.dialed_on_load = sockets.length === 1;
s0.onopen();
out.state_connected = state._text === "connected";
s0.onmessage({ data: JSON.stringify({ type: "UPSERT", id: "a" }) });
s0.onmessage({ data: "not json" });
out.frames_appended = feed.children.length === 2;
const pres = feed.children.map((f) => f.children.find((c) => c.tag === "pre")._text);
out.json_pretty_printed = pres[0] === JSON.stringify({ type: "UPSERT", id: "a" }, null, 2);
out.non_json_verbatim = pres[1] === "not json";
out.newest_last = true && pres.length === 2; // append order IS arrival order
wipe.onclick();
out.clear_wipes = feed.children.length === 0;
s0.onclose();
out.state_disconnected = state._text === "disconnected";
out.reconnect_scheduled = timers.length === 1;
timers[0].fn();
out.redialed = sockets.length === 2;
console.log(JSON.stringify(out));
