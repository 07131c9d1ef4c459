"""Progressive JPEG (SOF2) decode tests.

Independent ground truth: Java ImageIO (libjpeg-derived), driven
through a tiny compiled helper — it ENCODES progressive streams with
its own scan script (DC/AC first + refinement passes, EOB runs,
4:2:0 subsampling for color) and DECODES them back. The pure-python
decoder must be exact on block-flat gray (any conforming decoder is:
DC-only blocks are integer-flat) and within IDCT/upsample rounding on
general content, with progressive and sequential encodings of the same
image decoding identically.
"""

import os
import shutil
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from krawler_spark.operators.jpegcodec import decode_jpeg

JAVA = shutil.which("java")
JAVAC = shutil.which("javac")

_SRC = textwrap.dedent(
    """
    import javax.imageio.*;
    import javax.imageio.stream.*;
    import java.awt.image.*;
    import java.io.*;
    public class JpegTool {
        static BufferedImage readPnm(String path) throws IOException {
            DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)));
            String magic = next(in);
            int w = Integer.parseInt(next(in));
            int h = Integer.parseInt(next(in));
            next(in);
            boolean color = magic.equals("P6");
            BufferedImage img = new BufferedImage(w, h,
                color ? BufferedImage.TYPE_3BYTE_BGR : BufferedImage.TYPE_BYTE_GRAY);
            byte[] row = new byte[w * (color ? 3 : 1)];
            WritableRaster r = img.getRaster();
            for (int y = 0; y < h; y++) {
                in.readFully(row);
                for (int x = 0; x < w; x++) {
                    if (color) {
                        r.setSample(x, y, 0, row[3*x] & 0xFF);
                        r.setSample(x, y, 1, row[3*x+1] & 0xFF);
                        r.setSample(x, y, 2, row[3*x+2] & 0xFF);
                    } else r.setSample(x, y, 0, row[x] & 0xFF);
                }
            }
            return img;
        }
        static String next(DataInputStream in) throws IOException {
            StringBuilder sb = new StringBuilder(); int c;
            while ((c = in.read()) != -1) {
                if (c == '#') { while ((c = in.read()) != -1 && c != '\\n'); continue; }
                if (Character.isWhitespace(c)) { if (sb.length() > 0) break; continue; }
                sb.append((char) c);
            }
            return sb.toString();
        }
        public static void main(String[] a) throws Exception {
            if (a[0].equals("encode")) {
                BufferedImage img = readPnm(a[1]);
                ImageWriter w = ImageIO.getImageWritersByFormatName("jpeg").next();
                ImageWriteParam p = w.getDefaultWriteParam();
                p.setProgressiveMode(a[3].equals("1")
                    ? ImageWriteParam.MODE_DEFAULT : ImageWriteParam.MODE_DISABLED);
                p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                p.setCompressionQuality(Integer.parseInt(a[4]) / 100f);
                try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[2]))) {
                    w.setOutput(os);
                    w.write(null, new IIOImage(img, null, null), p);
                }
                w.dispose();
            } else {
                BufferedImage img = ImageIO.read(new File(a[1]));
                int w = img.getWidth(), h = img.getHeight();
                Raster r = img.getRaster();
                boolean color = r.getNumBands() >= 3;
                try (DataOutputStream out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(a[2])))) {
                    out.writeBytes((color ? "P6" : "P5") + "\\n" + w + " " + h + "\\n255\\n");
                    for (int y = 0; y < h; y++)
                        for (int x = 0; x < w; x++)
                            for (int b = 0; b < (color ? 3 : 1); b++)
                                out.writeByte(r.getSample(x, y, b));
                }
            }
        }
    }
    """
)


@pytest.fixture(scope="module")
def jio(tmp_path_factory):
    if not (JAVA and JAVAC):
        pytest.skip("JDK not present")
    d = tmp_path_factory.mktemp("jio")
    (d / "JpegTool.java").write_text(_SRC)
    subprocess.run([JAVAC, "JpegTool.java"], cwd=d, check=True, timeout=120)

    def ppm_write(path, arr):
        color = arr.ndim == 3
        hdr = (b"P6" if color else b"P5") + b"\n%d %d\n255\n" % (
            arr.shape[1], arr.shape[0])
        path.write_bytes(hdr + arr.tobytes())

    def ppm_read(path):
        data = path.read_bytes()
        parts = data.split(b"\n", 3)
        magic = parts[0]
        w, h = map(int, parts[1].split())
        a = np.frombuffer(parts[3], np.uint8)
        return a.reshape(h, w, 3) if magic == b"P6" else a.reshape(h, w)

    def enc(arr, progressive, quality=90):
        ppm_write(d / "in.pnm", arr)
        subprocess.run(
            [JAVA, "-cp", str(d), "JpegTool", "encode", str(d / "in.pnm"),
             str(d / "out.jpg"), "1" if progressive else "0", str(quality)],
            check=True, timeout=120)
        return (d / "out.jpg").read_bytes()

    def dec(jpg):
        (d / "in.jpg").write_bytes(jpg)
        subprocess.run(
            [JAVA, "-cp", str(d), "JpegTool", "decode", str(d / "in.jpg"),
             str(d / "dec.ppm")], check=True, timeout=120)
        return ppm_read(d / "dec.ppm")

    return enc, dec


def test_progressive_blockflat_gray_exact(jio):
    enc, dec = jio
    rng = np.random.default_rng(41)
    vals = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    flat = np.kron(vals, np.ones((8, 8), np.uint8))
    jpg = enc(flat, progressive=True, quality=100)
    assert b"\xff\xc2" in jpg  # really progressive
    mine = decode_jpeg(jpg)[..., 0]
    assert (mine == dec(jpg)).all()
    assert (mine == flat).all()


def test_progressive_equals_sequential(jio):
    """The scan machinery must add zero error: progressive and
    sequential encodings of one image decode to (near-)identical
    pixels, and both sit within rounding of ImageIO's own decode."""
    enc, dec = jio
    rng = np.random.default_rng(43)
    gy, gx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    photo = np.clip(
        np.stack([128 + 80 * np.sin(gy / 9.0), 100 + 70 * np.cos(gx / 11.0),
                  (gy * 3 + gx * 2) % 256], axis=2), 0, 255).astype(np.uint8)
    gray = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    for img, tol in ((photo, 3), (gray, 2)):
        seq = decode_jpeg(enc(img, progressive=False)).astype(int)
        prog = decode_jpeg(enc(img, progressive=True)).astype(int)
        assert np.abs(seq - prog).max() <= 1
        ref = dec(enc(img, progressive=True)).astype(int)
        if ref.ndim == 2:
            ref = ref[..., None]
        d = np.abs(prog - ref)
        assert d.max() <= tol and d.mean() < 0.6, (d.max(), d.mean())


def test_progressive_noise_color_tolerance(jio):
    """Random chroma at 4:2:0 is the worst case for decoder-to-decoder
    divergence (float vs integer DCT); bound it rather than ignore."""
    enc, dec = jio
    rng = np.random.default_rng(47)
    noisy = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    jpg = enc(noisy, progressive=True)
    mine = decode_jpeg(jpg).astype(int)
    ref = dec(jpg).astype(int)
    d = np.abs(mine - ref)
    assert d.mean() < 1.5 and np.percentile(d, 99) <= 8 and d.max() <= 32
