"""Minimal in-process WSGI test client."""

import io
import json


def request(app, method: str, path: str, body=None):
    raw = json.dumps(body).encode() if body is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "CONTENT_LENGTH": str(len(raw)),
        "wsgi.input": io.BytesIO(raw),
        "wsgi.errors": io.StringIO(),
        "wsgi.url_scheme": "http",
        "SERVER_NAME": "test",
        "SERVER_PORT": "80",
        "QUERY_STRING": "",
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    chunks = app(environ, start_response)
    data = b"".join(chunks)
    captured["body"] = data
    ctype = captured["headers"].get("Content-Type", "")
    if ctype.startswith("application/json"):
        captured["json"] = json.loads(data or b"null")
    return captured
