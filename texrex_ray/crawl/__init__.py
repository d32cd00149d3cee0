"""The ClaraX-equivalent crawler: walk policy, synthetic fetcher, frontier
engine (actor-sharded state), sequential oracle."""
