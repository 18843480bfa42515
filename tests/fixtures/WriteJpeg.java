import javax.imageio.*;
import javax.imageio.stream.*;
import javax.imageio.plugins.jpeg.*;
import javax.imageio.metadata.*;
import org.w3c.dom.*;
import java.awt.image.*;
import java.io.*;
import java.util.Iterator;

/**
 * Writes baseline JPEGs with deterministic pixel content (fixed LCG) and
 * dumps the ORIGINAL pixels as raw bytes alongside, so Python can compute
 * PSNR without re-generating. Usage:
 *   java WriteJpeg <out.jpg> <out.raw> <w> <h> <gray|rgb> <quality> [restart]
 * Pattern: smooth gradient + LCG noise (so PSNR at q=0.95 lands ~40+).
 */
public class WriteJpeg {
    public static void main(String[] args) throws Exception {
        String out = args[0], raw = args[1];
        int w = Integer.parseInt(args[2]);
        int h = Integer.parseInt(args[3]);
        boolean gray = args[4].equals("gray");
        // args[4] may also be "smoothrgb"
        float q = Float.parseFloat(args[5]);
        int restart = args.length > 6 ? Integer.parseInt(args[6]) : 0;
        BufferedImage img = new BufferedImage(
            w, h, gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_INT_RGB);
        long s = 99999L;
        DataOutputStream ro = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(raw)));
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                boolean smooth = args[4].startsWith("smooth");
                s = (s * 6364136223846793005L + 1442695040888963407L);
                int noise = smooth ? 0 : (int) ((s >>> 33) % 32) - 16;
                int base = (int) (127.5 + 100.0 * Math.sin(x * 0.12)
                                  * Math.cos(y * 0.09));
                int v = Math.max(0, Math.min(255, base + noise));
                if (gray) {
                    img.getRaster().setSample(x, y, 0, v);
                    ro.writeByte(v);
                } else if (smooth) {
                    int r2 = (int) (127.5 + 100.0 * Math.sin(x * 0.05) * Math.cos(y * 0.04));
                    int g2 = (int) (127.5 + 90.0 * Math.sin((x + y) * 0.03));
                    int b2 = (int) (127.5 + 80.0 * Math.cos(x * 0.02 + y * 0.01));
                    img.setRGB(x, y, (r2 << 16) | (g2 << 8) | b2);
                    ro.writeByte(r2); ro.writeByte(g2); ro.writeByte(b2);
                } else {
                    s = (s * 6364136223846793005L + 1442695040888963407L);
                    int g = Math.max(0, Math.min(255,
                        v + (int) ((s >>> 33) % 21) - 10));
                    s = (s * 6364136223846793005L + 1442695040888963407L);
                    int b = Math.max(0, Math.min(255,
                        255 - v + (int) ((s >>> 33) % 21) - 10));
                    img.setRGB(x, y, (v << 16) | (g << 8) | b);
                    ro.writeByte(v); ro.writeByte(g); ro.writeByte(b);
                }
            }
        }
        ro.close();
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter wr = it.next();
        JPEGImageWriteParam p = (JPEGImageWriteParam) wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        if (args.length > 7 && args[7].equals("progressive"))
            p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        IIOMetadata meta = null;
        if (restart > 0) {
            meta = wr.getDefaultImageMetadata(
                new ImageTypeSpecifier(img), p);
            String fmt = "javax_imageio_jpeg_image_1.0";
            IIOMetadataNode root = (IIOMetadataNode) meta.getAsTree(fmt);
            NodeList seqs = root.getElementsByTagName("markerSequence");
            IIOMetadataNode seq = (IIOMetadataNode) seqs.item(0);
            IIOMetadataNode dri = new IIOMetadataNode("dri");
            dri.setAttribute("interval", Integer.toString(restart));
            seq.insertBefore(dri, seq.getFirstChild());
            meta.setFromTree(fmt, root);
        }
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(new File(out))) {
            wr.setOutput(ios);
            wr.write(null, new IIOImage(img, null, meta), p);
        }
        wr.dispose();
        System.out.println("wrote " + out);
    }
}
