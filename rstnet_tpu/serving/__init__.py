"""Real-time duplex voice serving: WebSocket server + client."""
