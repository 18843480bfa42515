import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.awt.*;
import java.io.*;
import java.util.Iterator;

/** TIFF variant fixtures: JPEG-compressed (gray + RGB) and palette.
 * Usage: java WriteTiffVariants <out.tif> <out.raw> <w> <h> <jpeggray|jpegrgb|palette>
 * Deterministic smooth patterns; raw dump = original samples (gray: 1 byte,
 * rgb: 3 bytes, palette: index byte). */
public class WriteTiffVariants {
    public static void main(String[] args) throws Exception {
        String out = args[0], raw = args[1];
        int w = Integer.parseInt(args[2]), h = Integer.parseInt(args[3]);
        String mode = args[4];
        BufferedImage img;
        DataOutputStream ro = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(raw)));
        if (mode.equals("palette")) {
            byte[] r = new byte[16], g = new byte[16], b = new byte[16];
            for (int i = 0; i < 16; i++) {
                r[i] = (byte)(i * 16); g[i] = (byte)(255 - i * 16); b[i] = (byte)(i * 8 + 64);
            }
            IndexColorModel cm = new IndexColorModel(8, 16, r, g, b);
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int idx = (x / 4 + y / 3) % 16;
                    img.getRaster().setSample(x, y, 0, idx);
                    ro.writeByte(idx);
                }
        } else if (mode.equals("jpeggray")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int v = (int)(127.5 + 100.0 * Math.sin(x * 0.11) * Math.cos(y * 0.08));
                    img.getRaster().setSample(x, y, 0, v);
                    ro.writeByte(v);
                }
        } else {
            img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int r2 = (int)(127.5 + 100.0 * Math.sin(x * 0.05) * Math.cos(y * 0.04));
                    int g2 = (int)(127.5 + 90.0 * Math.sin((x + y) * 0.03));
                    int b2 = (int)(127.5 + 80.0 * Math.cos(x * 0.02 + y * 0.01));
                    img.setRGB(x, y, (r2 << 16) | (g2 << 8) | b2);
                    ro.writeByte(r2); ro.writeByte(g2); ro.writeByte(b2);
                }
        }
        ro.close();
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("TIFF");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        if (mode.startsWith("jpeg")) {
            p.setCompressionType("JPEG");
            p.setCompressionQuality(0.95f);
        } else {
            p.setCompressionType("Deflate");
        }
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(new File(out))) {
            wr.setOutput(ios);
            wr.write(null, new IIOImage(img, null, null), p);
        }
        wr.dispose();
        System.out.println("wrote " + out);
    }
}
