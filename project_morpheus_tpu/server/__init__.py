"""REST/WS serving layer (reference L6, Morpheus_Client/server.py).

aiohttp application exposing the OpenAI-style speech API, websocket PCM
streaming, adapter/source registries, runtime config mutation, stats and
barge-in, plus the static admin dashboard.
"""

from .app import create_app, start_server
from .client import Client

__all__ = ["create_app", "start_server", "Client"]
