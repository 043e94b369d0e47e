"""Minimal web chat UI (the reference's gradio_web_server.py capability —
template selection, controller-dispatched streaming, conversation logging —
without the gradio dependency, which is absent in this environment).

Serves a single-page chat app (vanilla JS, streams the \\0-delimited chunk
protocol via fetch) plus a JSON relay endpoint. Conversations are logged as
JSONL like the reference (:274-286).
"""

from __future__ import annotations

import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from merlin_tpu.serve.protocol import http_json
from merlin_tpu.utils.constants import LOGDIR

PAGE = """<!doctype html><html><head><meta charset='utf-8'>
<title>merlin-tpu chat</title>
<style>body{font-family:sans-serif;max-width:720px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:16em;white-space:pre-wrap}
textarea{width:100%%}</style></head><body>
<h3>merlin-tpu</h3><div id=log></div>
<p><textarea id=q rows=3 placeholder='Ask...'></textarea>
<button onclick=send()>Send</button>
<input type=file id=img accept='image/*'></p>
<script>
let history=[];
async function send(){
  const q=document.getElementById('q').value; if(!q)return;
  history.push(['USER',q]);
  render('...');
  let images=[];
  const f=document.getElementById('img').files[0];
  if(f){images=[await new Promise(r=>{const fr=new FileReader();
    fr.onload=()=>r(fr.result.split(',')[1]);fr.readAsDataURL(f);})];}
  const resp=await fetch('/chat',{method:'POST',
    body:JSON.stringify({history:history,images:images})});
  const reader=resp.body.getReader();const dec=new TextDecoder();
  let buf='',answer='';
  while(true){const {done,value}=await reader.read();if(done)break;
    buf+=dec.decode(value,{stream:true});
    const parts=buf.split('\\u0000');buf=parts.pop();
    for(const p of parts){if(!p)continue;const c=JSON.parse(p);
      answer=c.text;render(answer);}}
  history.push(['ASSISTANT',answer]);
  document.getElementById('q').value='';render('');
}
function render(cur){
  let out='';for(const [r,m] of history)out+=r+': '+m+'\\n';
  if(cur)out+='ASSISTANT: '+cur;
  document.getElementById('log').textContent=out;}
</script></body></html>"""


def make_handler(controller_address: str, model: str, log_dir: str):
    from merlin_tpu.utils.conversation import conv_templates

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            conv = conv_templates["v1"].copy()
            history = req.get("history", [])
            for i, (role, msg) in enumerate(history):
                conv.append_message(conv.roles[0 if role == "USER" else 1],
                                    msg)
            conv.append_message(conv.roles[1], None)
            payload = {"model": model, "prompt": conv.get_prompt(),
                       "images": req.get("images", []),
                       "temperature": req.get("temperature", 0.2),
                       "max_new_tokens": req.get("max_new_tokens", 512),
                       "stop": conv.sep2}
            resp = http_json("POST",
                             controller_address + "/get_worker_address",
                             {"model": model})
            address = resp.get("address")
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            if not address:
                self.wfile.write(
                    json.dumps({"text": "no worker", "error_code": 2})
                    .encode() + b"\0")
                return
            import urllib.request

            r = urllib.request.Request(
                address + "/worker_generate_stream",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(r, timeout=300) as stream:
                while True:
                    data = stream.read(1024)
                    if not data:
                        break
                    self.wfile.write(data)
                    self.wfile.flush()
            # conversation logging (gradio_web_server.py:274-286)
            os.makedirs(log_dir, exist_ok=True)
            with open(os.path.join(
                    log_dir, time.strftime("conv-%Y-%m-%d.jsonl")), "a") as f:
                f.write(json.dumps({"time": time.time(),
                                    "history": history}) + "\n")

    return Handler


def serve(controller_address: str, *, host: str = "0.0.0.0",
          port: int = 7860, model: str = "merlin-tpu",
          log_dir: str = LOGDIR) -> ThreadingHTTPServer:
    return ThreadingHTTPServer(
        (host, port), make_handler(controller_address, model, log_dir))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--controller", default="http://localhost:21001")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--model", default="merlin-tpu")
    args = p.parse_args()
    serve(args.controller, host=args.host, port=args.port,
          model=args.model).serve_forever()


if __name__ == "__main__":
    main()
