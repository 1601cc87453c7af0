#!/usr/bin/env python
"""Emit a neuroglancer viewer state for local precomputed layers
(reference scripts/visualize_neuroglancer.py; works without the neuroglancer
package — serve the layers with any static file server supporting CORS and
paste the printed state into neuroglancer-demo.appspot.com).

Usage: python scripts/visualize_neuroglancer.py --image layer_im --seg layer_seg \
    [--host http://localhost:8000]
"""
import argparse, json, urllib.parse

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None)
    p.add_argument("--seg", default=None)
    p.add_argument("--host", default="http://localhost:8000")
    args = p.parse_args()
    layers = []
    if args.image:
        layers.append({"type": "image", "source": f"precomputed://{args.host}/{args.image}",
                       "name": "image"})
    if args.seg:
        layers.append({"type": "segmentation", "source": f"precomputed://{args.host}/{args.seg}",
                       "name": "segmentation"})
    state = {"layers": layers, "layout": "4panel"}
    print(json.dumps(state, indent=2))
    frag = urllib.parse.quote(json.dumps(state, separators=(",", ":")))
    print(f"\nhttps://neuroglancer-demo.appspot.com/#!{frag}")
    print(f"\nserve layers with: python -m http.server 8000  (from the layer parent dir)")

if __name__ == "__main__":
    main()
